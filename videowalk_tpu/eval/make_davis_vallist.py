"""Generate a DAVIS val filelist for test.py.

The reference ships a machine-specific ``davis_vallist.txt``
(``<jpeg_dir> <annotation_dir>`` lines; code/eval/davis_vallist.txt). This
utility generates the same format from any DAVIS-2017 root.

CLI: python -m videowalk_tpu.eval.make_davis_vallist --davis /path/DAVIS \
        [--split val] [--out davis_vallist.txt]
"""

from __future__ import annotations

import argparse
import os


def make_list(davis_root: str, split: str = "val") -> list[str]:
    with open(os.path.join(davis_root, "ImageSets", "2017",
                           f"{split}.txt")) as f:
        videos = [line.strip() for line in f if line.strip()]
    return [
        f"{os.path.join(davis_root, 'JPEGImages', '480p', v)} "
        f"{os.path.join(davis_root, 'Annotations', '480p', v)}"
        for v in videos
    ]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--davis", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--out", default="davis_vallist.txt")
    args = parser.parse_args(argv)
    lines = make_list(args.davis, args.split)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} entries to {args.out}")


if __name__ == "__main__":
    main()
