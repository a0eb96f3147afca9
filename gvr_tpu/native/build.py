"""Build the native runtime library: python -m gvr_tpu.native.build"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build(verbose=True):
    src = os.path.join(HERE, "gvr_native.cpp")
    out = os.path.join(HERE, "libgvr_native.so")
    cmd = ["g++", "-O2", "-std=c++17", "-fPIC", "-Wall", "-shared",
           "-o", out, src]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    sys.exit(0 if os.path.exists(build()) else 1)
