"""Offset-shift a labeled reference point-cloud text file in place.

Script parity: examples/build_reference_point_cloud.py:11-61 in the
reference — same CLI, same '(x, y, z) class part' line format, same 3-decimal
rewrite.

Usage: python build_reference_point_cloud.py <point_cloud.txt> "(x,y,z)"
"""

import os
import sys

import numpy as np

HELP = """usage: python build_reference_point_cloud.py <point_cloud.txt> <offset>

  point_cloud.txt   one point per line as '(x, y, z) class_label part_label'
  offset            translation to subtract, written as "(x,y,z)"

Rewrites the file in place with the offset removed from every coordinate."""


def main(filepath: str, offset: str) -> None:
    try:
        vals = offset.replace("(", "").replace(")", "").split(",")
        offset_np = np.array([float(vals[0]), float(vals[1]), float(vals[2])])
    except Exception as e:
        print(HELP)
        print(f"Could not parse the offset argument ({type(e).__name__}: {e})")
        return

    if not os.path.isfile(filepath):
        print(HELP)
        print(f"No such file: {filepath}")
        return

    newlines = []
    with open(filepath, "r") as f:
        for line in f:
            try:
                end_idx = line.find(")")
                pos = line[:end_idx].replace("(", "").split(",")
                newlines.append(
                    f"({float(pos[0]) - offset_np[0]:.3f}, "
                    f"{float(pos[1]) - offset_np[1]:.3f}, "
                    f"{float(pos[2]) - offset_np[2]:.3f}{line[end_idx:]}"
                )
            except Exception as e:
                print(HELP)
                print(f"Could not parse a point line ({type(e).__name__}: {e})")
                return

    with open(filepath, "w") as f:
        f.writelines(newlines)
    print(f"Wrote shifted cloud back to {filepath}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(HELP)
    else:
        main(sys.argv[1], sys.argv[2])
