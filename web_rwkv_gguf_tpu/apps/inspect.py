"""Dump GGUF metadata and tensor info (ref: debug_gguf.rs)."""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", help=".gguf file")
    p.add_argument("--tensors", action="store_true", help="list all tensors")
    p.add_argument("--detect", action="store_true", help="run version detection")
    args = p.parse_args(argv)

    from ..gguf import GgufFile

    f = GgufFile(args.model)
    print(f"gguf version: {f.version}")
    print(f"tensor count: {len(f.tensors)}")
    print(f"data offset:  {f.tensor_data_offset}")
    print("metadata:")
    for k, v in sorted(f.metadata.items()):
        s = str(v)
        if len(s) > 80:
            s = s[:77] + "..."
        print(f"  {k} = {s}")
    if args.tensors:
        print("tensors:")
        for name, info in sorted(f.tensors.items()):
            print(
                f"  {name:50} {str(tuple(info.dims)):>20} {info.dtype.name:>6} "
                f"@ {info.offset}"
            )
    if args.detect:
        from ..models import detect_info

        print("detected:", detect_info(f))


if __name__ == "__main__":
    main()
