"""Model zoo: named access to the bundled Haar cascades.

The reference hardcodes an absolute developer path to one XML
(``main.cpp:10,36``); here cascades are resolved by name through, in order:

1. the repo-local compiled artifact directory
   (``clfacedetection_tpu/models/artifacts/<name>.npz``, produced by
   ``scripts/import_models.py`` — the framework's native model format),
2. an XML directory given via ``$CLFD_CASCADE_DIR``,
3. OpenCV's bundled data dir (``cv2.data.haarcascades``, new-format XMLs),
   if ``cv2`` is importable.

The 19 cascade names below mirror the reference's bundled model files
(SURVEY.md section 2.2 R3).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

from .haar_xml import parse_haar_xml
from .spec import CascadeSpec

__all__ = ["CASCADE_NAMES", "load_cascade", "artifact_dir", "available_cascades"]

CASCADE_NAMES: List[str] = [
    "haarcascade_eye",
    "haarcascade_eye_tree_eyeglasses",
    "haarcascade_frontalface_alt",
    "haarcascade_frontalface_alt2",
    "haarcascade_frontalface_alt_tree",
    "haarcascade_frontalface_default",
    "haarcascade_fullbody",
    "haarcascade_lefteye_2splits",
    "haarcascade_lowerbody",
    "haarcascade_mcs_eyepair_big",
    "haarcascade_mcs_eyepair_small",
    "haarcascade_mcs_lefteye",
    "haarcascade_mcs_mouth",
    "haarcascade_mcs_nose",
    "haarcascade_mcs_righteye",
    "haarcascade_mcs_upperbody",
    "haarcascade_profileface",
    "haarcascade_righteye_2splits",
    "haarcascade_upperbody",
]


def artifact_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "artifacts")


def _xml_search_dirs() -> List[str]:
    dirs = []
    env = os.environ.get("CLFD_CASCADE_DIR")
    if env:
        dirs.append(env)
    try:
        import cv2  # type: ignore
        dirs.append(cv2.data.haarcascades)
    except Exception:
        pass
    return dirs


def available_cascades() -> Dict[str, str]:
    """Map of cascade name -> resolvable source path."""
    out: Dict[str, str] = {}
    adir = artifact_dir()
    if os.path.isdir(adir):
        for fn in sorted(os.listdir(adir)):
            if fn.endswith(".npz"):
                out.setdefault(fn[:-4], os.path.join(adir, fn))
    for d in _xml_search_dirs():
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".xml"):
                    out.setdefault(fn[:-4], os.path.join(d, fn))
    return out


@functools.lru_cache(maxsize=None)
def load_cascade(name: str, path: Optional[str] = None) -> CascadeSpec:
    """Load a cascade by name (or explicit path to .xml/.npz)."""
    if path is None:
        if name.endswith(".xml") or name.endswith(".npz"):
            path = name
            name = os.path.basename(name)[:-4]
        else:
            path = available_cascades().get(name)
            if path is None:
                raise FileNotFoundError(
                    f"cascade {name!r} not found; searched artifacts dir "
                    f"{artifact_dir()!r} and {_xml_search_dirs()!r}. Run "
                    "scripts/import_models.py or set $CLFD_CASCADE_DIR.")
    if path.endswith(".npz"):
        spec = CascadeSpec.load(path)
    else:
        spec = parse_haar_xml(path, name=name)
    return spec
