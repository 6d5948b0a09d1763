"""Bounded retry for transient runtime faults (SURVEY.md §5.3).

The axon TPU tunnel occasionally surfaces transient HTTP/stream faults
as JaxRuntimeError ("response body closed before all bytes were read",
"UNAVAILABLE: ...") — one such error cost round 3 its official benchmark
record (BENCH_r03.json rc=1). Anything that must not lose minutes of
work to one flaky call (the driver bench, the multi-chip dry run, long
CLI renders) runs under `with_retries`. Deterministic re-execution is
safe everywhere in this framework: every random draw is keyed by
(seed, pixel, sample, bounce), so a retried call returns the same value.

The reference has no analog (single host, .unwrap() everywhere —
/root/reference/src/main.rs:94-107); the criterion bench's
keep-all-iterations behavior (benches/benchmark.rs:38-42) is the bar.
"""

import time


# Deterministic gRPC/XLA status classes: re-running cannot fix these,
# and each futile retry burns minutes of wall on ~60 s phases.
_DETERMINISTIC = ("resource_exhausted", "invalid_argument",
                  "unimplemented", "failed_precondition", "not_found",
                  "out_of_range", "mosaic")


def is_transient(exc: BaseException) -> bool:
    """Failure classes worth retrying: tunnel/stream faults land as
    JaxRuntimeError/XlaRuntimeError (INTERNAL/UNAVAILABLE with
    HTTP/stream messages) or OSError. Deterministic classes (OOM,
    compile/shape errors) are NOT retried even when wrapped in the same
    exception types."""
    msg = str(exc).lower()
    if any(s in msg for s in _DETERMINISTIC):
        return False
    name = type(exc).__name__
    if name in ("JaxRuntimeError", "XlaRuntimeError"):
        return True
    if isinstance(exc, (OSError, ConnectionError)):
        return True
    return any(s in msg for s in ("remote_compile", "connection",
                                  "response body", "unavailable",
                                  "deadline exceeded"))


def with_retries(fn, max_attempts: int = 3, base_delay: float = 2.0,
                 on_retry=None):
    """Run fn() with up to max_attempts tries on transient failures.

    Non-transient exceptions (programming errors) propagate immediately;
    the last transient exception propagates after the attempts are
    exhausted. `on_retry(attempt, exc)` is called before each re-try
    (logging, re-warming). fn must be idempotent."""
    for attempt in range(max_attempts):
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except BaseException as e:  # noqa: BLE001 — classified below
            if not is_transient(e) or attempt == max_attempts - 1:
                raise
            if on_retry is not None:
                on_retry(attempt, e)
            time.sleep(base_delay * (attempt + 1))
