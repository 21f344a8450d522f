"""Keypoint/descriptor set serialization — the checkpoint artifact.

The reference's closest equivalents are write_sift_kp/read_sift_kp and
read_desc_all_level (Src/cUtil.cc:938-1016, 1286-1321): text dumps of
keypoint records and descriptors used to hand results between the extract
and match phases. Here the extracted KeypointSet is the natural checkpoint
between extraction and matching/registration (SURVEY.md §5): save/load as a
compressed .npz with a format version, so multi-volume group registration
can resume from per-volume extraction results.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

FORMAT_VERSION = 2
_FIELDS = (
    "xyz", "rxyz", "octave", "level", "scale", "rotation", "desc",
    "status", "valid", "counts", "caps",
)


def save_keypoints(path: str | Path, kps, compact: bool = True) -> None:
    """Save a KeypointSet to .npz. With compact=True only valid keypoints
    are stored (the usual checkpoint); compact=False keeps every lane
    including rejected ones (debug dumps)."""
    import jax

    arrays = {f: np.asarray(jax.device_get(getattr(kps, f))) for f in _FIELDS}
    if compact:
        sel = arrays["valid"]
        for f in _FIELDS:
            if f not in ("counts", "caps"):
                arrays[f] = arrays[f][sel]
    np.savez_compressed(path, format_version=FORMAT_VERSION, **arrays)


def load_keypoints(path: str | Path):
    """Load a KeypointSet saved by save_keypoints."""
    from ..pipeline import KeypointSet

    with np.load(path) as z:
        version = int(z["format_version"])
        if version not in (1, FORMAT_VERSION):
            raise ValueError(f"unsupported keypoint file version {version}")
        arrays = {f: z[f] for f in _FIELDS if f in z}
        if "caps" not in arrays:  # version-1 files predate the caps field
            arrays["caps"] = np.full_like(arrays["counts"], np.iinfo(np.int32).max)
        return KeypointSet(**arrays)
