from . import distance, frontier, topk
