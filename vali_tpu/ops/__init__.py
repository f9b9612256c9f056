"""Batched functional ops (the TPU-native compute layer).

Import the submodules directly for the full API:

  - ``ops.csc``          23-pair color-space / layout conversions
  - ``ops.resize``       matmul-based Lanczos/bilinear resampling
  - ``ops.rotate``       rotation
  - ``ops.ud``           fused upsample-downscale-convert (UDSurface parity)
  - ``ops.fused``        single-pass CSC+resize(+normalize) preprocess
  - ``ops.pallas_fused`` the banded Pallas TPU kernel for the NV12 hot path
  - ``ops.colors``       colorimetry matrices as data
  - ``ops.metrics``      batched on-device MSE/PSNR/SSIM (beyond reference)
  - ``ops.analytics``    histograms, luma stats, scene-change detection
                         (beyond reference)
  - ``ops.tonemap``      HDR->SDR tone mapping: PQ/HLG, BT.2390/
                         Reinhard/Hable, BT.2020->BT.709 (beyond
                         reference)
  - ``ops.jpeg``         device JPEG DCT+quant stage
"""
