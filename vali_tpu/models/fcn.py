"""A compact fully-convolutional segmentation model (pure JAX).

Role parity: the reference's end-to-end ML integration test feeds decoded
frames into torchvision's FCN-ResNet101 (tests/test_TorchSegmentation.py).
This model is the TPU-native analogue used by tests/bench/graft entry: a
small FCN that consumes the pipeline's [N, H, W, 3] output directly (no
framework interop needed — frames are already jax arrays in HBM).

Convs run in NHWC with bfloat16 accumulating to float32 on the MXU.
`param_specs` gives tensor-parallel PartitionSpecs (channels over "model")
for the multi-chip dry run.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _conv(x, w, stride=1):
    # bf16 in / bf16 out; the TPU MXU accumulates in f32 internally.
    # (An explicit preferred_element_type=f32 breaks the autodiff transpose
    # dtype match, so it is deliberately omitted.)
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def init_params(key, num_classes: int = 21,
                widths: Tuple[int, ...] = (32, 64, 128, 256),
                dtype=jnp.bfloat16) -> Dict:
    params = {}
    cin = 3
    for i, cout in enumerate(widths):
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * cin
        params[f"conv{i}"] = {
            "w": (jax.random.normal(k1, (3, 3, cin, cout), dtype=jnp.float32)
                  * np.sqrt(2.0 / fan_in)).astype(dtype),
            "b": jnp.zeros((cout,), dtype=dtype),
        }
        cin = cout
    key, k1 = jax.random.split(key)
    params["head"] = {
        "w": (jax.random.normal(k1, (1, 1, cin, num_classes),
                                dtype=jnp.float32)
              * np.sqrt(2.0 / cin)).astype(dtype),
        "b": jnp.zeros((num_classes,), dtype=dtype),
    }
    return params


def param_specs(params) -> Dict:
    """Tensor-parallel specs: output channels sharded over 'model'."""
    return jax.tree_util.tree_map(
        lambda leaf: P(None, None, None, "model") if leaf.ndim == 4
        else P("model"), params)


def apply(params, x) -> jax.Array:
    """x: [N, H, W, 3] uint8 or float -> per-pixel class logits.

    Activations stay bfloat16 (MXU-native) end to end; _conv deliberately
    omits preferred_element_type so forward and autodiff-transpose dtypes
    stay consistent (see the note on _conv).
    """
    h = x.astype(jnp.bfloat16)
    if x.dtype == jnp.uint8:
        h = h / 255.0
    num_layers = sum(1 for k in params if k.startswith("conv"))
    for i in range(num_layers):
        p = params[f"conv{i}"]
        stride = 2 if 0 < i < 4 else 1
        h = _conv(h, p["w"], stride=stride) + p["b"]
        h = jax.nn.relu(h)
    p = params["head"]
    return _conv(h, p["w"]) + p["b"]


def predict_classes(params, x) -> jax.Array:
    return jnp.argmax(apply(params, x), axis=-1)
