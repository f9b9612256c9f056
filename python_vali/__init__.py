"""Drop-in compatibility alias: ``import python_vali as vali`` works against
vali-tpu, so code written for the reference VALI package runs unchanged on
TPU (decode/encode move to the host engine, transforms to XLA/Pallas).
"""

from vali_tpu import *  # noqa: F401,F403
from vali_tpu import __getattr__ as _vali_getattr
from vali_tpu import __version__  # noqa: F401  (reference exports it too)


def __getattr__(name):
    return _vali_getattr(name)
