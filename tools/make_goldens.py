#!/usr/bin/env python
"""Generate golden renders from the reference renderer (RGKrt).

Builds small-resolution / high-spp variants of reference scene configs
(reference scenes/*.json), renders them through the locally-built
reference binary (tools/refbuild/build/RGKrt — see build.sh), converts
the OpenEXR output (reference src/texture.cpp:356-374) to .npy with
exr2npy, and stores the result under tests/goldens/.

The golden configs live in a scratch work dir with symlinks to the
reference's asset directories, because RGKrt resolves every path
relative to the config file's directory (reference config.cpp:420,448).

Usage:
    python tools/make_goldens.py [name ...]   # default: all
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF_SCENES = "/root/reference/scenes"
WORK = os.path.join(HERE, "goldens_work")
OUT = os.path.join(REPO, "tests", "goldens")
RGKRT = os.path.join(HERE, "refbuild", "build", "RGKrt")
EXR2NPY = os.path.join(HERE, "refbuild", "build", "exr2npy")

# name -> (source config, overrides). Resolution/spp are chosen so each
# golden converges well below the test tolerance while rendering in
# minutes on this host's 2 vCPUs (the reference uses hwconc-1 = 1
# worker thread, render_driver.cpp:205-206).
GOLDENS = {
    # Analytic primitives, diffuse + areal light (flagship config).
    "cornell-box": ("cornell-box.json", {"multisample": 4096}),
    # Mesh import (meshes/sphere.obj), LTC Beckmann + dielectric.
    "cornell-box-spheres": ("cornell-box-spheres.json", {"multisample": 4096}),
    # OBJ model-file + textures + bump mapping + point light.
    "rubiks-bump": ("rubiks-bump.json", {"multisample": 1024}),
    # Bidirectional (reverse=2) box for BDPT parity.
    "box2": ("box2.json", {"multisample": 4096}),
}
RES = 96


def load_commented_json(path: str) -> dict:
    text = open(path).read()
    # The corpus uses // and /* */ comments (jsoncpp extension); none
    # of the files contain comment markers inside string literals.
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    text = re.sub(r"//[^\n]*", "", text)
    return json.loads(text)


def prepare_workdir() -> None:
    os.makedirs(WORK, exist_ok=True)
    os.makedirs(OUT, exist_ok=True)
    for entry in os.listdir(REF_SCENES):
        src = os.path.join(REF_SCENES, entry)
        if os.path.isdir(src):
            dst = os.path.join(WORK, entry)
            if not os.path.islink(dst):
                os.symlink(src, dst)


def make_golden(name: str) -> str:
    src_cfg, overrides = GOLDENS[name]
    cfg = load_commented_json(os.path.join(REF_SCENES, src_cfg))
    cfg["output-width"] = RES
    cfg["output-height"] = RES
    cfg["rounds"] = 1
    cfg["output-file"] = f"{name}_golden.exr"
    cfg.update(overrides)
    cfg_path = os.path.join(WORK, f"{name}_golden.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    exr = os.path.join(WORK, cfg["output-file"])
    if os.path.exists(exr):
        os.unlink(exr)
    print(f"[{name}] rendering with RGKrt ...", flush=True)
    subprocess.run([RGKRT, cfg_path, "-q"], cwd=WORK, check=True)
    npy = os.path.join(OUT, f"{name}_{RES}.npy")
    subprocess.run([EXR2NPY, exr, npy], check=True)
    print(f"[{name}] -> {npy}", flush=True)
    return npy


def main(argv: list[str]) -> int:
    if not (os.path.exists(RGKRT) and os.path.exists(EXR2NPY)):
        print("Build the reference first: tools/refbuild/build.sh",
              file=sys.stderr)
        return 1
    prepare_workdir()
    names = argv or list(GOLDENS)
    for name in names:
        make_golden(name)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
