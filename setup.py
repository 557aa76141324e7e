"""Build hook: compile the native C++ runtime into the wheel when a
toolchain is present (reference parity: setup.py:1-13 + build-wheels.sh in
/root/reference build a rust cdylib into the wheel).  Installation never
fails without a compiler — granne_tpu.native falls back to building lazily
at import, or to the pure-numpy codec mirror.
"""

import subprocess
import sys
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        super().run()
        src = Path(self.build_lib) / "granne_tpu" / "native" / "codec.cpp"
        out = src.with_name("libgranne_tpu.so")
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-o", str(out), str(src), "-lpthread",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"granne-tpu: native build skipped ({e}); "
                  "the library will build lazily at import", file=sys.stderr)


setup(cmdclass={"build_py": BuildWithNative})
