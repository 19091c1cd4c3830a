"""Device profiling helpers (SURVEY.md section 5: the reference's only
profiling is plonky2 TimingTree; the TPU equivalent is jax.profiler
traces + the timing trees in vfhe_tpu.utils.timing)."""

from __future__ import annotations

import contextlib
import logging

log = logging.getLogger("vfhe_tpu")


@contextlib.contextmanager
def device_trace(logdir: str | None):
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf) around
    a block, e.g. one step proof. No-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax
    log.info("capturing device trace to %s", logdir)
    with jax.profiler.trace(logdir):
        yield
