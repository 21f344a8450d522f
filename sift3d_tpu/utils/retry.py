"""Transient-failure detection and retry for remote-TPU execution.

The reference is a single CPU process with printf-and-continue error
handling (SURVEY §5: failure detection "absent"); a TPU deployment adds a
real failure mode the reference never had: the device is reached over a
network tunnel / PJRT plugin that can drop mid-run (observed here: the
axon tunnel goes down for 30-60 min stretches), surfacing as
XlaRuntimeError with UNAVAILABLE / INTERNAL / DEADLINE_EXCEEDED statuses.

`retry_transient` classifies raised errors into transient (retry with
exponential backoff — the computation is pure, so a re-dispatch is safe
and exact) vs permanent (OOM, shape/compile errors: re-raise immediately;
retrying cannot help and would mask real bugs).
"""

from __future__ import annotations

import functools
import logging
import time

log = logging.getLogger("sift3d_tpu.retry")

# Status substrings that indicate the DEVICE/TRANSPORT failed, not the
# program: safe to retry (pure functional compute, no device state to
# corrupt — buffers are re-uploaded by the re-dispatch).
_TRANSIENT = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "connection",            # tunnel transport resets
    "remote_compile",        # axon compile-helper HTTP failures
    "socket closed",
)

# Statuses that look scary but must NOT be retried blindly.
_PERMANENT = (
    "RESOURCE_EXHAUSTED",    # OOM: deterministic, retry would loop
    "INVALID_ARGUMENT",
    "NOT_FOUND",
    "UNIMPLEMENTED",
)


def is_transient(err: BaseException) -> bool:
    msg = str(err)
    if any(k in msg for k in _PERMANENT):
        return False
    return any(k in msg for k in _TRANSIENT)


def retry_transient(fn=None, *, attempts: int = 3, base_delay_s: float = 2.0,
                    max_delay_s: float = 60.0):
    """Decorator/wrapper: retry `fn` on transient device/tunnel failures.

    Exponential backoff between attempts; the final failure is re-raised.
    Only errors classified by `is_transient` are retried.
    """

    def deco(f):
        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            delay = base_delay_s
            for attempt in range(attempts):
                try:
                    return f(*args, **kwargs)
                except Exception as e:  # noqa: BLE001 — classified below
                    if attempt == attempts - 1 or not is_transient(e):
                        raise
                    log.warning(
                        "transient device failure (attempt %d/%d): %s — "
                        "retrying in %.1fs",
                        attempt + 1, attempts, str(e)[:200], delay,
                    )
                    time.sleep(delay)
                    delay = min(delay * 2, max_delay_s)
            raise AssertionError("unreachable")

        return wrapped

    return deco(fn) if fn is not None else deco
