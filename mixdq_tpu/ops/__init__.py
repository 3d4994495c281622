import os

import jax

from . import qops
from .qops import qconv2d, qlinear, quantize_per_tensor


def pallas_mode():
    """(use_pallas, interpret) for the current backend.

    On TPU the Pallas kernels run compiled. On CPU they are skipped
    (XLA fallbacks keep numerics identical) unless
    ``MIXDQ_PALLAS_INTERPRET=1``, which forces the Pallas paths in
    interpret mode — used by the multichip CPU-mesh dryrun and tests to
    exercise the int8_sec section path (incl. its sharding behavior)
    without TPU hardware."""
    if jax.default_backend() != "cpu":
        return True, False
    if os.environ.get("MIXDQ_PALLAS_INTERPRET", "") == "1":
        return True, True
    return False, False
