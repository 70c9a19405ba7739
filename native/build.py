"""Build the native C++ components into esc_tpu/native/.

Usage: python native/build.py
No external deps: invokes g++ directly (pybind11 isn't in the image;
the library exposes a C ABI consumed via ctypes).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT_DIR = os.path.join(HERE, "..", "esc_tpu", "native")


TARGETS = {
    "wavio.cpp": "libescwav.so",
    "rangecoder.cpp": "libescrc.so",
}


def build():
    os.makedirs(OUT_DIR, exist_ok=True)
    for src_name, out_name in TARGETS.items():
        src = os.path.join(HERE, src_name)
        out = os.path.join(OUT_DIR, out_name)
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", src, "-o", out]
        print(" ".join(cmd))
        subprocess.check_call(cmd)
        print(f"built {out}")


if __name__ == "__main__":
    sys.exit(build())
