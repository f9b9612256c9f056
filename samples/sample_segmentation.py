"""End-to-end inference: multi-stream decode -> fused TPU preprocess ->
segmentation model, no host round trip after decode.

vali-tpu analogue of the reference's
sample_segmentation_cvcuda_interop.ipynb / tests/test_TorchSegmentation.py:
where the reference bridges NVDEC -> DLPack -> torch, here decoded frames
are already jax arrays in HBM and flow straight into the model.
"""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vali_tpu.models import fcn  # noqa: E402
from vali_tpu.pipeline.multistream import MultiStreamPipeline  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    params = fcn.init_params(jax.random.PRNGKey(0))
    infer = jax.jit(lambda p, x: fcn.predict_classes(p, x))

    pipe = MultiStreamPipeline([uri] * n_streams, dst_w=224, dst_h=224,
                               gpu_id=0, out_dtype=jnp.float32)
    frames = 0
    for batch, ids in pipe:
        classes = infer(params, batch)
        frames += batch.shape[0]
        if frames % 64 < batch.shape[0]:
            hist = np.bincount(np.asarray(classes[0]).reshape(-1),
                               minlength=4)[:4]
            print(f"{frames} frames; classes[0] histogram head: {hist}")
    print(f"segmented {frames} frames from {n_streams} streams")


if __name__ == "__main__":
    main()
