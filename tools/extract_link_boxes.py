"""Regenerate the vendored Franka link-box constants from pybullet_data.

Run on any machine with pybullet_data installed:

    python tools/extract_link_boxes.py

and paste the printed LINK_BOX_DIMS into edmp_tpu/constants.py.  The
procedure matches the reference exactly (lib/guide.py:245-282): AABB extents
of each collision .obj mesh, finger y-extent widened x4.
"""

import os
import re
import sys

import numpy as np

LINK_NAMES = ["link1", "link2", "link3", "link4", "link5", "link6", "link7",
              "hand", "finger"]


def mesh_aabb_extent(path):
    vs = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("v "):
                vs.append([float(c) for c in re.split(r"\s+", line)[1:4]])
    vs = np.asarray(vs)
    return vs.max(axis=0) - vs.min(axis=0)


def main():
    try:
        import pybullet_data
    except ImportError:
        print("pybullet_data not installed — run this on a machine with the "
              "reference's dependencies.", file=sys.stderr)
        return 1
    folder = os.path.join(pybullet_data.getDataPath(),
                          "franka_panda", "meshes", "collision")
    dims = []
    for i, name in enumerate(LINK_NAMES):
        d = mesh_aabb_extent(os.path.join(folder, f"{name}.obj"))
        if i == len(LINK_NAMES) - 1:
            d = d.copy()
            d[1] *= 4  # finger y-widening, lib/guide.py:278-279
        dims.append(d)
    print("LINK_BOX_DIMS = np.array([")
    for name, d in zip(LINK_NAMES, dims):
        print(f"    [{d[0]:.6f}, {d[1]:.6f}, {d[2]:.6f}],  # {name}")
    print("], dtype=np.float64)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
