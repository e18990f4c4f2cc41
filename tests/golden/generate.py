"""Regenerate golden test data from the reference oracle.

Builds the reference binary + the gen_golden dump tool out-of-tree (in /tmp),
runs them on the deterministic synthetic images, and packs the per-stage
tensors into compressed .npz files under tests/golden/data/ (committed).

Requires OpenCV dev headers (pkg-config opencv4) — available in the build
container; the committed .npz files mean CI/tests never need OpenCV.
"""

import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
WORK = "/tmp/golden_work"

# (image_name, num_stage_octaves, upscale, pack_suffix). Stage tensors are
# bulky, so full pyramid dumps only for the two small images; the 640x480
# image gets end-to-end records only.  The upscale job gates the
# doubleImage + pd=0.5 detection path (helpers.cpp:297-329,
# pyramid.cpp:267-273) end to end.
JOBS = [
    ("synth_256x200", 3, 0, ""),
    ("synth_200x160", 2, 0, ""),
    ("synth_640x480", 0, 0, ""),
    ("synth_200x160", 0, 1, "_up"),
]


def sh(cmd, **kw):
    print("+", cmd)
    subprocess.run(cmd, shell=True, check=True, **kw)


def build_tool():
    shim = os.path.join(WORK, "shim")
    os.makedirs(shim, exist_ok=True)
    with open(os.path.join(shim, "cv.h"), "w") as f:
        f.write("#include <opencv2/opencv.hpp>\n#include <string.h>\n")
    with open(os.path.join(shim, "highgui.h"), "w") as f:
        f.write("#include <opencv2/highgui/highgui.hpp>\n")
    sh(
        f"g++ -O3 -w -I {shim} -I {REF} {HERE}/gen_golden.cpp "
        f"{REF}/pyramid.cpp {REF}/helpers.cpp {REF}/affine.cpp "
        f"{REF}/siftdesc.cpp $(pkg-config opencv4 --cflags --libs) -lrt "
        f"-o {WORK}/gen_golden"
    )


def pack(name, dumpdir, outpath):
    arrays = {}
    with open(os.path.join(dumpdir, "manifest.txt")) as f:
        for line in f:
            aname, dtype, rows, cols = line.split()
            raw = np.fromfile(
                os.path.join(dumpdir, aname + ".bin"), dtype=np.float32
            )
            arrays[aname] = raw.reshape(int(rows), int(cols))
    with open(os.path.join(dumpdir, "out.hesaff.sift"), "rb") as f:
        arrays["sift_file"] = np.frombuffer(f.read(), dtype=np.uint8)
    np.savez_compressed(outpath, **arrays)
    print(f"packed {name}: {len(arrays)} arrays -> {outpath} "
          f"({os.path.getsize(outpath)//1024} KiB)")


def main():
    os.makedirs(WORK, exist_ok=True)
    sys.path.insert(0, HERE)
    import gen_images

    gen_images.main(WORK)
    build_tool()
    datadir = os.path.join(HERE, "data")
    os.makedirs(datadir, exist_ok=True)
    for name, octaves, upscale, suffix in JOBS:
        pname = name + suffix
        dumpdir = os.path.join(WORK, pname)
        os.makedirs(dumpdir, exist_ok=True)
        sh(f"{WORK}/gen_golden {WORK}/{name}.ppm {dumpdir} {octaves} "
           f"{upscale}")
        pack(pname, dumpdir, os.path.join(datadir, pname + ".npz"))
        # also keep the source image next to the goldens
        import shutil
        shutil.copy(f"{WORK}/{name}.ppm", os.path.join(datadir, name + ".ppm"))


if __name__ == "__main__":
    main()
