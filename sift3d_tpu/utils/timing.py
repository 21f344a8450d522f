"""Stage timers and process reports.

TPU-native analogue of the reference's wall-clock instrumentation:
`SIFT_TimerPara` / `SIFT_PROCESS` (Include/Util/common.h:22-59,
Src/Util/common.cpp) and the `time_info` stage printer
(Src/cSIFT3D.cc:78-101). Timings are wall-clock with block_until_ready
barriers; for device-side truth use `jax.profiler.trace` (the reference has
no equivalent).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any

import jax


@dataclasses.dataclass
class SiftTimer:
    """Per-stage wall-clock record (the reference's SIFT_TimerPara fields:
    allocation, BuildGSS, BuildDOG, Detect, AssignOrientation, Extraction)."""

    stages: dict[str, float] = dataclasses.field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def record(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> str:
        lines = [f"\t\ttime:{v * 1e3:.3f}ms  ----{k}" for k, v in self.stages.items()]
        lines.append(f"\ttotal time:{self.total:.3f}s")
        return "\n".join(lines)


@dataclasses.dataclass
class SiftProcessReport:
    """Extract(ref) + extract(tar) + match timing bundle (SIFT_PROCESS,
    Include/Util/common.h:43-59)."""

    ref: SiftTimer = dataclasses.field(default_factory=SiftTimer)
    tar: SiftTimer = dataclasses.field(default_factory=SiftTimer)
    match: SiftTimer = dataclasses.field(default_factory=SiftTimer)

    def report(self) -> str:
        return (
            "== reference volume ==\n" + self.ref.report()
            + "\n== target volume ==\n" + self.tar.report()
            + "\n== matching ==\n" + self.match.report()
        )


def rejection_histogram(kps) -> dict[str, int]:
    """Reference's per-stage rejection counters (Src/cSIFT3D.cc:468-478):
    counts of weak-gradient / non-distinct-eigen / corner rejections and
    accepted keypoints."""
    import numpy as np

    status = np.asarray(jax.device_get(kps.status))
    return {
        "detected": int((status != 0).sum()),
        "accepted": int((status == 1).sum()),
        "weak_gradient": int((status == -1).sum()),
        "non_distinct_eigen": int((status == -2).sum()),
        "large_corner_angle": int((status == -3).sum()),
    }
