"""Convenience file-level API.

The reference offers a path-based factory (CSIFT3DFactory::CreateCSIFT3D
(std::string), Src/cSIFT3D.cc:112-125) and the Example.cpp driver flow; this
module is the equivalent one-call surface: volumes in, matched coordinate
pairs out.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .config import SiftConfig
from .pipeline import SIFT3D, biject_match, enhanced_match, inject_match

_MATCHERS = {
    "inject": inject_match,
    "biject": biject_match,
    "enhanced": enhanced_match,
}


def load_volume(path: str | Path) -> np.ndarray:
    """Load a volume by extension: .nii/.nii.gz (NIfTI) or anything else as
    the reference's matrixIO3D raw binary format."""
    p = str(path)
    if p.endswith(".nii") or p.endswith(".nii.gz"):
        from .io.native import read_nii

        return read_nii(p)
    from .io.matrixio import read_matrix

    return read_matrix(p)


def extract_file(path: str | Path, cfg: SiftConfig | None = None):
    """Extract keypoints from a volume file (path-based factory parity)."""
    sift = SIFT3D(cfg)
    return sift.extract(load_volume(path))


def match_files(
    ref_path: str | Path,
    tar_path: str | Path,
    threshold: float = 0.85,
    mode: str = "enhanced",
    cfg: SiftConfig | None = None,
    retries: int = 3,
):
    """Example.cpp in one call: returns (ref_coords, tar_coords) as dense
    (M, 3) original-image coordinate arrays of the surviving pairs.

    `retries`: transient device/tunnel failures (remote-TPU UNAVAILABLE /
    connection drops) are retried with exponential backoff — the compute
    is pure, so a re-dispatch is exact (utils/retry.py). Permanent errors
    (OOM, invalid shapes) raise immediately. Set retries=1 to disable."""
    from .utils.retry import retry_transient

    sift = SIFT3D(cfg)
    ref_vol = load_volume(ref_path)
    tar_vol = load_volume(tar_path)

    @retry_transient(attempts=max(retries, 1))
    def run():
        ref_kps, tar_kps = sift.extract_pair(ref_vol, tar_vol)
        rc, tc, valid = _MATCHERS[mode](ref_kps, tar_kps, threshold)
        v = np.asarray(valid)
        return np.asarray(rc)[v], np.asarray(tc)[v]

    return run()


def process_batch(
    pairs,
    threshold: float = 0.85,
    mode: str = "enhanced",
    cfg: SiftConfig | None = None,
    retries: int = 3,
    io_workers: int = 2,
    lookahead: int = 2,
):
    """Serve a stream of volume pairs: yields (ref_coords, tar_coords) per
    (ref_path, tar_path) item of `pairs`, in order.

    Host-side NIfTI/matrixIO decoding runs in a thread pool `lookahead`
    pairs ahead of the device, so IO overlaps device compute (the pipeline
    dispatches asynchronously; extraction of pair k runs while pair k+1
    decodes). One SIFT3D instance serves the whole batch, so same-shape
    volumes reuse every compiled module. Transient device failures retry
    per pair (see match_files)."""
    from concurrent.futures import ThreadPoolExecutor

    from .utils.retry import retry_transient

    sift = SIFT3D(cfg)
    pairs = list(pairs)

    def load_pair(item):
        ref_path, tar_path = item
        return load_volume(ref_path), load_volume(tar_path)

    with ThreadPoolExecutor(max_workers=max(io_workers, 1)) as pool:
        futures = []
        nxt = 0

        def top_up():
            nonlocal nxt
            while nxt < len(pairs) and len(futures) < max(lookahead, 1) + 1:
                futures.append(pool.submit(load_pair, pairs[nxt]))
                nxt += 1

        top_up()
        for _ in range(len(pairs)):
            ref_vol, tar_vol = futures.pop(0).result()
            top_up()

            @retry_transient(attempts=max(retries, 1))
            def run(ref_vol=ref_vol, tar_vol=tar_vol):
                ref_kps, tar_kps = sift.extract_pair(ref_vol, tar_vol)
                rc, tc, valid = _MATCHERS[mode](ref_kps, tar_kps, threshold)
                v = np.asarray(valid)
                return np.asarray(rc)[v], np.asarray(tc)[v]

            yield run()
