#!/usr/bin/env python
"""Compile Haar-cascade XMLs into the framework's native .npz artifacts.

Usage:
    python scripts/import_models.py [--src DIR] [--dst DIR] [names...]

Reads old- or new-format OpenCV cascade XMLs from --src (default:
$CLFD_CASCADE_DIR, falling back to the read-only reference checkout) and
writes compiled ``CascadeSpec`` artifacts into the repo-local zoo
(``clfacedetection_tpu/models/artifacts``). The artifact is this framework's
versioned flat-array model format — the analog of the reference's
runtime-parsed XML models (SURVEY.md section 5, checkpoint/resume).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from clfacedetection_tpu.models import parse_haar_xml, zoo  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.environ.get(
        "CLFD_CASCADE_DIR", "/root/reference/CLFaceDetection"))
    ap.add_argument("--dst", default=zoo.artifact_dir())
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    names = args.names or [fn[:-4] for fn in sorted(os.listdir(args.src))
                           if fn.endswith(".xml")]
    for name in names:
        src = os.path.join(args.src, name + ".xml")
        spec = parse_haar_xml(src, name=name)
        dst = os.path.join(args.dst, name + ".npz")
        spec.save(dst)
        kb = os.path.getsize(dst) / 1024
        print(f"{name}: {spec.n_stages} stages, {spec.n_nodes} nodes "
              f"-> {dst} ({kb:.0f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
