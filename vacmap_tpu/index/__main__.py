"""Standalone index pre-build: python -m vacmap_tpu.index ref.fa [out.vmi.npz] [k] [w]

Equivalent of the reference's index.py helper (index.py:26)."""

import sys

from ..io.fastx import fastx_read
from .index import ReferenceIndex


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    ref = sys.argv[1]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"{ref}.w{w}_k{k}.vmi"
    # standalone pre-builds are usually genome-scale: always stream
    # through the bounded-memory external-sort builder
    ReferenceIndex.build_external(
        ((r[0], r[1]) for r in fastx_read(ref)), out, k=k, w=w
    )
    print(f"index written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
