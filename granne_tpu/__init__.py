"""granne-tpu: a TPU-native approximate nearest neighbor framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of granne
(https://github.com/granne/granne, reference mounted at /root/reference):
memory-efficient HNSW build + search over dense f32 / int8 cosine vectors
and bag-of-embedding elements, with serialization, extensible indexes,
locality reordering and Python-first APIs — redesigned for TPU:

* dense int32 adjacency tensors in HBM instead of pointer-chased CSR;
* batched frontier (beam) search advancing hundreds of queries in lockstep,
  with distances as MXU contractions (int8 paths accumulate in int32);
* wave-parallel index construction with deterministic, conflict-free
  reverse-edge resolution instead of per-node locks;
* additional TPU-native engines with the same serving API: an exact
  brute-force MXU scan and an IVF index whose cluster-centric scoring
  turns random row gathers into streaming block matmuls;
* query sharding across a ``jax.sharding.Mesh`` for multi-chip serving;
* host-DRAM <-> HBM tiering as the billion-vector mmap analogue.
"""

from .index.builder import MAX_ELEMENTS, BuildConfig, build_layers
from .index.granne import Granne
from .index.graph import LayerStack
from .index.ivf import IvfIndex
from .index.rw import RwGranneBuilder
from .elements.angular import AngularVectors
from .elements.angular_int import AngularIntVectors
from .elements.embeddings import SumEmbeddings
from .models.brute import BruteForceIndex
from .api import Embeddings, GranneBuilder, WordEmbeddingsGranne, compute_distance, load_granne

__version__ = "0.1.0"

__all__ = [
    "BuildConfig",
    "build_layers",
    "Granne",
    "GranneBuilder",
    "Embeddings",
    "WordEmbeddingsGranne",
    "LayerStack",
    "IvfIndex",
    "BruteForceIndex",
    "RwGranneBuilder",
    "AngularVectors",
    "AngularIntVectors",
    "SumEmbeddings",
    "compute_distance",
    "load_granne",
]
