"""Encoder / JPEG / CPU frame converter tests.

Ports the shape of reference tests/test_PyNvEncoder.py (packet production,
flush) plus decode->encode->decode round trips that the reference cannot do
bit-exactly (ASIC) but a software codec can verify strongly.
"""

import numpy as np
import pytest

import vali_tpu as vali

F = vali.PixelFormat
W, H = 320, 240
RNG = np.random.default_rng(3)


def nv12_surface(y_fill, gpu_id=0):
    y = np.full((H, W), y_fill, np.uint8)
    uv = np.full((H // 2, W), 128, np.uint8)
    frame = np.concatenate([y.reshape(-1), uv.reshape(-1)])
    surf = vali.Surface.Make(F.NV12, W, H)
    up = vali.PyFrameUploader(gpu_id=gpu_id)
    ok, _ = up.Run(frame, surf)
    assert ok
    return surf


def test_encoder_basic_and_flush():
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bitrate": "1M"}, gpu_id=0,
                           format=F.NV12)
    assert enc.Width == W and enc.Height == H
    assert enc.Format == F.NV12
    assert enc.FrameSizeInBytes == W * H * 3 // 2

    packet = np.zeros(0, dtype=np.uint8)
    produced = 0
    for i in range(8):
        surf = nv12_surface(40 + 20 * i)
        ok = enc.EncodeSingleSurface(surf, packet)
        # reference contract (PyNvEncoder.cpp:260): True iff a packet was
        # written; False while the codec's frame-delay queue is filling
        assert ok == bool(packet.size)
        if ok:
            produced += 1
    packets = np.zeros(0, dtype=np.uint8)
    enc.Flush(packets)
    assert produced + (1 if packets.size else 0) > 0
    assert packets.size or produced


def test_encoder_roundtrip_through_decoder(tmp_path):
    enc = vali.PyNvEncoder(
        {"s": f"{W}x{H}", "bitrate": "2M", "fps": "30", "gop": "4"},
        gpu_id=0, format=F.NV12)
    chunks = []
    fills = [50, 80, 110, 140, 170, 200]
    packet = np.zeros(0, dtype=np.uint8)
    for fill in fills:
        if enc.EncodeSingleSurface(nv12_surface(fill), packet):
            chunks.append(packet.tobytes())
    flush_pkts = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush_pkts)
    if flush_pkts.size:
        chunks.append(flush_pkts.tobytes())

    es_path = tmp_path / "round.h264"
    es_path.write_bytes(b"".join(chunks))

    dec = vali.PyDecoder(str(es_path), {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame[:W * H].mean()))
    assert len(means) == len(fills)
    for got, want in zip(means, fills):
        assert abs(got - want) < 2.0


def test_encoder_sei(tmp_path):
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "gop": "1"}, gpu_id=0,
                           format=F.NV12)
    sei_payload = bytes(range(16)) + b"hello sei world"
    packet = np.zeros(0, dtype=np.uint8)
    chunks = []
    for _ in range(3):
        if enc.EncodeSingleSurface(
                nv12_surface(100), packet,
                sei=np.frombuffer(sei_payload, np.uint8)):
            chunks.append(packet.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    if flush.size:
        chunks.append(flush.tobytes())
    es = b"".join(chunks)
    assert b"hello sei world" in es


def test_encoder_delayed_output_contract(tmp_path):
    """With B-frames the codec delays output; EncodeSingleSurface must
    return False (empty packet) until the frame-delay queue fills, then
    True with bytes — and everything decodes back after Flush (parity:
    PyNvEncoder.cpp:260)."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bf": "2", "gop": "30",
                            "lookahead": "4"},
                           gpu_id=0, format=F.NV12)
    packet = np.zeros(0, dtype=np.uint8)
    results = []
    chunks = []
    n_in = 16
    for i in range(n_in):
        ok = enc.EncodeSingleSurface(nv12_surface(60 + 10 * i), packet)
        assert ok == bool(packet.size)
        results.append(ok)
        if ok:
            chunks.append(packet.tobytes())
    assert not results[0], "B-frame pipeline cannot emit on first frame"
    assert any(results), "encoder never produced a packet"
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    es = tmp_path / "delay.h264"
    es.write_bytes(b"".join(chunks) + flush.tobytes())
    dec = vali.PyDecoder(str(es), {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    n_out = 0
    while dec.DecodeSingleFrame(frame)[0]:
        n_out += 1
    assert n_out == n_in


def _encode_es(opts, n_frames=12, fmt=F.NV12, fills=None):
    """Encode n synthetic frames, return the full elementary stream."""
    enc = vali.PyNvEncoder(opts, gpu_id=0, format=fmt)
    packet = np.zeros(0, dtype=np.uint8)
    chunks = []
    for i in range(n_frames):
        fill = (fills[i] if fills else 60 + 12 * i) % 256
        if enc.EncodeSingleSurface(nv12_surface(fill), packet):
            chunks.append(packet.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    return b"".join(chunks) + flush.tobytes()


def _h264_nal_types(es):
    """NAL unit types in an annex-B H.264 stream."""
    types = []
    i = 0
    while True:
        i = es.find(b"\x00\x00\x01", i)
        if i < 0:
            break
        types.append(es[i + 3] & 0x1F)
        i += 3
    return types


def _h264_slice_types(es):
    """Slice types of every VCL NAL (annex-B): 'I', 'P' or 'B'.

    slice_type is the second ue(v) in the slice header (after
    first_mb_in_slice), per H.264 7.3.3."""
    out = []
    i = 0
    while True:
        i = es.find(b"\x00\x00\x01", i)
        if i < 0:
            break
        nal_type = es[i + 3] & 0x1F
        if nal_type in (1, 5):
            payload = es[i + 4:i + 12]
            bits = "".join(f"{b:08b}" for b in payload)

            def read_ue(pos):
                zeros = 0
                while bits[pos + zeros] == "0":
                    zeros += 1
                val = int(bits[pos + zeros:pos + 2 * zeros + 1], 2) - 1
                return val, pos + 2 * zeros + 1

            _, p = read_ue(0)           # first_mb_in_slice
            st, _ = read_ue(p)          # slice_type
            out.append("PBI"[st % 5] if st % 5 < 3 else "?")
        i += 3
    return out


def test_encoder_gop_observable(tmp_path):
    """gop=4 must yield an IDR every 4 frames in the output bitstream
    (parity: NvEncoderClInterface gopLength -> observable key frames)."""
    es = _encode_es({"s": f"{W}x{H}", "gop": "4", "bf": "0",
                     "lookahead": "0"}, n_frames=12)
    nals = _h264_nal_types(es)
    assert nals.count(5) == 3, nals  # IDR slices at frames 0, 4, 8


def test_encoder_bf_observable(tmp_path):
    """bf>0 must put B slices in the bitstream; bf=0 must not (parity:
    NVENC frameIntervalP). Frames vary so the encoder can't demote all
    candidates to P; decode-back count must still match."""
    fills = [30 + 13 * i for i in range(16)]
    for bf, expect_b in (("0", False), ("2", True)):
        es = _encode_es({"s": f"{W}x{H}", "bf": bf, "gop": "30",
                         "lookahead": "4"}, n_frames=16, fills=fills)
        slices = _h264_slice_types(es)
        assert len(slices) == 16
        assert ("B" in slices) == expect_b, (bf, slices)
        p = tmp_path / f"bf{bf}.h264"
        p.write_bytes(es)
        dec = vali.PyDecoder(str(p), {}, gpu_id=-1)
        frame = np.zeros(dec.HostFrameSize, np.uint8)
        n = 0
        while dec.DecodeSingleFrame(frame)[0]:
            n += 1
        assert n == 16


def test_encoder_profile_observable(tmp_path):
    """profile= must land in the stream: decoder reports the H.264
    profile (66/578=constrained baseline, 100=high)."""
    for profile, idcs in (("baseline", (66, 578)), ("high", (100,))):
        es = _encode_es({"s": f"{W}x{H}", "profile": profile, "gop": "8"},
                        n_frames=8)
        p = tmp_path / f"{profile}.h264"
        p.write_bytes(es)
        dec = vali.PyDecoder(str(p), {}, gpu_id=-1)
        assert dec.Profile in idcs, (profile, dec.Profile)


def test_encoder_fps_observable(tmp_path):
    es = _encode_es({"s": f"{W}x{H}", "fps": "25", "gop": "8"}, n_frames=8)
    p = tmp_path / "fps25.h264"
    p.write_bytes(es)
    dec = vali.PyDecoder(str(p), {}, gpu_id=-1)
    assert abs(dec.Framerate - 25.0) < 0.01


def test_encoder_repeatspspps_h264_default(tmp_path):
    """Annex-B H.264 elementary streams repeat SPS/PPS on every IDR (the
    libx264 default with global headers off) — the behavior repeatspspps
    requests from NVENC."""
    es = _encode_es({"s": f"{W}x{H}", "gop": "2", "bf": "0",
                     "lookahead": "0", "repeatspspps": "1"}, n_frames=6)
    nals = _h264_nal_types(es)
    assert nals.count(5) == 3  # 3 IDRs
    assert nals.count(7) >= 3 and nals.count(8) >= 3, nals  # SPS+PPS each


def test_encoder_repeatspspps_hevc(tmp_path):
    """repeatspspps on HEVC maps to x265 repeat-headers: VPS/SPS/PPS must
    appear before every IDR, not just once."""
    def hevc_nals(es):
        out, i = [], 0
        while True:
            i = es.find(b"\x00\x00\x01", i)
            if i < 0:
                return out
            out.append((es[i + 3] >> 1) & 0x3F)
            i += 3

    enc_opts = {"s": f"{W}x{H}", "codec": "hevc", "gop": "2", "bf": "0",
                "lookahead": "0"}
    # annex-B elementary streams repeat headers per IDR by default
    # (FFmpeg sets x265 repeat-headers when global headers are off), so
    # repeatspspps semantics hold with and without the explicit option
    es_on = _encode_es(dict(enc_opts, repeatspspps="1"), n_frames=6)
    nals = hevc_nals(es_on)
    assert nals.count(33) >= 3, nals            # SPS before every IDR
    assert nals.count(32) >= 3 and nals.count(34) >= 3  # VPS + PPS too


def test_encoder_tuning_high_quality_valid():
    """tuning_info=high_quality maps to a slower preset (observable only
    as a valid open + encode here; quality effect needs long content)."""
    es = _encode_es({"s": f"{W}x{H}", "tuning_info": "high_quality",
                     "gop": "4"}, n_frames=4)
    assert len(es) > 0


def test_encoder_option_validation():
    with pytest.raises(RuntimeError):
        vali.PyNvEncoder({"s": "320x240", "bogus_key": "1"}, gpu_id=0)
    with pytest.raises(RuntimeError):
        vali.PyNvEncoder({"bitrate": "1M"}, gpu_id=0)  # missing "s"


def test_encoder_reconfigure():
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bitrate": "1M"}, gpu_id=0)
    packet = np.zeros(0, dtype=np.uint8)
    enc.EncodeSingleSurface(nv12_surface(90), packet)
    assert enc.Reconfigure({"bitrate": "3M"}, force_idr=True,
                           reset_encoder=True)
    enc.EncodeSingleSurface(nv12_surface(90), packet)


def test_encoder_capabilities_and_params():
    enc = vali.PyNvEncoder({"s": f"{W}x{H}"}, gpu_id=0)
    caps = enc.Capabilities
    assert caps[vali.NV_ENC_CAPS.WIDTH_MAX] >= 4096
    params = vali.GetNvencParams()
    assert "codec" in params and "s" in params and len(params) == 29


def test_hevc_encoder(tmp_path):
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "codec": "hevc",
                            "bitrate": "1M"}, gpu_id=0, format=F.NV12)
    packet = np.zeros(0, dtype=np.uint8)
    chunks = []
    for _ in range(4):
        if enc.EncodeSingleSurface(nv12_surface(120), packet):
            chunks.append(packet.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    es_path = tmp_path / "round.h265"
    data = b"".join(chunks) + flush.tobytes()
    assert data
    es_path.write_bytes(data)
    dec = vali.PyDecoder(str(es_path), {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    n = 0
    while dec.DecodeSingleFrame(frame)[0]:
        n += 1
    assert n >= 1


def test_jpeg_encoder():
    jpeg = vali.PyNvJpegEncoder(gpu_id=0)
    ctx = jpeg.Context(90, F.RGB)
    assert ctx.Compression() == 90
    assert ctx.Format() == F.RGB

    rgb = RNG.integers(0, 255, (H, W, 3), dtype=np.uint8)
    surf = vali.Surface.from_numpy(rgb, F.RGB)
    out, info = jpeg.Run(ctx, [surf, surf])
    assert info == vali.TaskExecInfo.SUCCESS
    assert len(out) == 2
    for blob in out:
        assert bytes(blob[:3]) == b"\xff\xd8\xff"

    # decode back through FFmpeg and check PSNR-level similarity
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(out[0].tobytes())
        path = f.name
    try:
        dec = vali.PyDecoder(path, {}, gpu_id=-1)
        frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
        ok, _ = dec.DecodeSingleFrame(frame)
        assert ok
    finally:
        os.unlink(path)


def test_jpeg_yuv420():
    jpeg = vali.PyNvJpegEncoder(gpu_id=0)
    ctx = jpeg.Context(85, F.YUV420)
    surf = vali.Surface.Make(F.YUV420, W, H)
    planes = [np.full((H, W), 90, np.uint8),
              np.full((H // 2, W // 2), 120, np.uint8),
              np.full((H // 2, W // 2), 140, np.uint8)]
    up = vali.PyFrameUploader(gpu_id=0)
    from vali_tpu.memory.host import planes_to_host_frame

    ok, _ = up.Run(planes_to_host_frame(planes), surf)
    assert ok
    out, info = jpeg.Run(ctx, [surf])
    assert info == vali.TaskExecInfo.SUCCESS
    assert bytes(out[0][:2]) == b"\xff\xd8"


def test_jpeg_format_mismatch():
    jpeg = vali.PyNvJpegEncoder(gpu_id=0)
    ctx = jpeg.Context(85, F.RGB)
    surf = vali.Surface.Make(F.NV12, W, H)
    out, info = jpeg.Run(ctx, [surf])
    assert info == vali.TaskExecInfo.SRC_DST_FMT_MISMATCH
    assert out == []


def test_frame_converter_yuv420_rgb():
    conv = vali.PyFrameConverter(W, H, F.YUV420, F.RGB)
    assert conv.Format == F.RGB
    y = np.full(W * H, 128, np.uint8)
    u = np.full(W * H // 4, 128, np.uint8)
    v = np.full(W * H // 4, 128, np.uint8)
    src = np.concatenate([y, u, v])
    dst = np.zeros(W * H * 3, np.uint8)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_709,
                                          vali.ColorRange.MPEG)
    ok, info = conv.Run(src, dst, cc)
    assert ok, info
    # neutral gray: (128-16)*1.164 = 130.4
    assert abs(float(dst.mean()) - 130.4) < 1.5


def test_frame_converter_resize_never_truncates():
    """Auto-resizing a wrong-sized dst must ceil-divide by itemsize:
    13x13 RGB needs 507 bytes, and a float32 dst floor-divided to
    507//4 = 126 elems (504 bytes) fails the native size check on every
    call after destroying the caller's buffer contents."""
    w = h = 13
    conv = vali.PyFrameConverter(w, h, F.YUV420, F.RGB)
    y = np.full(w * h, 128, np.uint8)
    # YUV420 src: swscale uses ceil-half chroma planes for odd sizes
    c = np.full(((w + 1) // 2) * ((h + 1) // 2), 128, np.uint8)
    src = np.concatenate([y, c, c])
    dst = np.zeros(1, np.float32)  # wrong size AND 4-byte itemsize
    ok, info = conv.Run(src, dst)
    assert ok, info
    assert dst.nbytes >= w * h * 3


def test_frame_converter_rgb_yuv420_roundtrip():
    conv = vali.PyFrameConverter(W, H, F.RGB, F.YUV420)
    back = vali.PyFrameConverter(W, H, F.YUV420, F.RGB)
    rgb = RNG.integers(0, 255, W * H * 3, dtype=np.uint8)
    # smooth the field so chroma subsampling loss is small
    rgb = rgb.reshape(H, W, 3)
    rgb[:] = rgb.mean(axis=(0, 1), keepdims=True).astype(np.uint8)
    rgb = rgb.reshape(-1)
    yuv = np.zeros(W * H * 3 // 2, np.uint8)
    out = np.zeros(W * H * 3, np.uint8)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    ok, _ = conv.Run(rgb, yuv, cc)
    assert ok
    ok, _ = back.Run(yuv, out, cc)
    assert ok
    assert np.abs(out.astype(int) - rgb.astype(int)).mean() < 4.0


def test_frame_converter_size_mismatch():
    conv = vali.PyFrameConverter(W, H, F.YUV420, F.RGB)
    ok, info = conv.Run(np.zeros(10, np.uint8), np.zeros(W * H * 3, np.uint8))
    assert not ok
    assert info == vali.TaskExecInfo.SRC_DST_SIZE_MISMATCH


def test_cpu_vs_tpu_converter_cross_validation():
    """Two independent implementations of YUV420->RGB (BT601 MPEG) must
    agree: libswscale (native) vs the XLA converter. This mirrors the
    reference's NVDEC-vs-CPU PSNR methodology."""
    y = RNG.integers(16, 236, (H, W), dtype=np.uint8)
    u = RNG.integers(16, 241, (H // 2, W // 2), dtype=np.uint8)
    v = RNG.integers(16, 241, (H // 2, W // 2), dtype=np.uint8)
    src = np.concatenate([y.reshape(-1), u.reshape(-1), v.reshape(-1)])
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)

    # CPU path
    conv = vali.PyFrameConverter(W, H, F.YUV420, F.RGB)
    cpu_rgb = np.zeros(W * H * 3, np.uint8)
    ok, _ = conv.Run(src, cpu_rgb, cc)
    assert ok

    # device path
    surf = vali.Surface.from_numpy(src, F.YUV420, width=W, height=H)
    dst = vali.Surface.Make(F.RGB, W, H)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    ok, _ = cvt.Run(surf, dst, cc)
    assert ok
    tpu_rgb = dst.to_numpy().reshape(-1)

    # chroma upsampling differs (swscale fully interpolates, the NPP-parity
    # device path replicates 2x2), which decorrelates heavily on random
    # chroma — the smooth-content test below is the real fidelity gate;
    # here check global statistics agree
    assert abs(float(cpu_rgb.mean()) - float(tpu_rgb.mean())) < 1.0
    mse = ((cpu_rgb.astype(np.float64) - tpu_rgb.astype(np.float64))**2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
    assert psnr > 12.0, psnr


def test_cpu_vs_tpu_converter_smooth_content():
    """On smooth content the two implementations agree to PSNR > 40."""
    yy, xx = np.mgrid[0:H, 0:W]
    y = (110 + 60 * np.sin(yy / 23.0) * np.cos(xx / 31.0)).astype(np.uint8)
    u = np.full((H // 2, W // 2), 120, np.uint8)
    v = np.full((H // 2, W // 2), 140, np.uint8)
    src = np.concatenate([y.reshape(-1), u.reshape(-1), v.reshape(-1)])
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    conv = vali.PyFrameConverter(W, H, F.YUV420, F.RGB)
    cpu_rgb = np.zeros(W * H * 3, np.uint8)
    assert conv.Run(src, cpu_rgb, cc)[0]
    surf = vali.Surface.from_numpy(src, F.YUV420, width=W, height=H)
    dst = vali.Surface.Make(F.RGB, W, H)
    assert vali.PySurfaceConverter(gpu_id=0).Run(surf, dst, cc)[0]
    tpu_rgb = dst.to_numpy().reshape(-1)
    mse = ((cpu_rgb.astype(np.float64) - tpu_rgb.astype(np.float64))**2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-12))
    assert psnr > 40.0, psnr


def test_encoder_append_mode():
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "gop": "1"}, gpu_id=0,
                           format=F.NV12)
    packet = np.zeros(0, dtype=np.uint8)
    sizes = []
    for i in range(3):
        enc.EncodeSingleSurface(nv12_surface(100 + i * 30), packet,
                                append=True)
        sizes.append(packet.size)
    # append accumulates monotonically
    assert sizes == sorted(sizes)
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    es = packet.tobytes() + flush.tobytes()
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".h264", delete=False) as f:
        f.write(es)
        path = f.name
    try:
        dec = vali.PyDecoder(path, {}, gpu_id=-1)
        frame = np.zeros(dec.HostFrameSize, np.uint8)
        n = 0
        while dec.DecodeSingleFrame(frame)[0]:
            n += 1
        assert n == 3
    finally:
        os.unlink(path)


def test_cpu_converter_nv12_rgb():
    """BASELINE config 1 path: PyFrameConverter NV12->RGB on CPU."""
    y = np.tile(np.linspace(16, 235, W).astype(np.uint8), (H, 1))
    uv = np.full((H // 2, W), 128, np.uint8)
    src = np.concatenate([y.reshape(-1), uv.reshape(-1)])
    conv = vali.PyFrameConverter(W, H, F.NV12, F.RGB)
    dst = np.zeros(W * H * 3, np.uint8)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_709,
                                          vali.ColorRange.MPEG)
    ok, info = conv.Run(src, dst, cc)
    assert ok, info
    want = np.clip(1.164 * (y.astype(np.float64) - 16), 0, 255)
    got = dst.reshape(H, W, 3).astype(np.float64)
    for c in range(3):
        assert np.abs(got[..., c] - want).max() <= 2.0


def test_encoder_10bit_roundtrip(tmp_path):
    """YUV420_10bit encode (x264 high-bit-depth) -> decode round trip."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bitrate": "2M", "gop": "1"},
                           gpu_id=0, format=F.YUV420_10bit)
    fills = [200, 500, 800]
    packet = np.zeros(0, dtype=np.uint8)
    chunks = []
    up = vali.PyFrameUploader(gpu_id=0)
    from vali_tpu.memory.host import planes_to_host_frame

    for fill in fills:
        planes = [np.full((H, W), fill, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16)]
        surf = vali.Surface.Make(F.YUV420_10bit, W, H)
        assert up.Run(planes_to_host_frame(planes), surf)[0]
        if enc.EncodeSingleSurface(surf, packet):
            chunks.append(packet.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    if flush.size:
        chunks.append(flush.tobytes())

    es = tmp_path / "ten.h264"
    es.write_bytes(b"".join(chunks))
    dec = vali.PyDecoder(str(es), {}, gpu_id=-1)
    assert dec.Format == F.YUV420_10bit
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame.view(np.uint16)[:W * H].mean()))
    assert len(means) == len(fills)
    for got, want in zip(means, fills):
        assert abs(got - want) < 8.0


def test_encoder_reconfigure_resolution_change(tmp_path):
    """Resolution change via Reconfigure(reset_encoder=True) — the
    reference's dynamic-res NVENC feature mapped onto encoder reopen."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "gop": "1"}, gpu_id=0,
                           format=F.NV12)
    pkt = np.zeros(0, dtype=np.uint8)
    enc.EncodeSingleSurface(nv12_surface(90), pkt)
    # without reset: refused
    assert not enc.Reconfigure({"s": "160x120"}, reset_encoder=False)
    # with reset: takes effect
    assert enc.Reconfigure({"s": "160x120"}, reset_encoder=True,
                           force_idr=True)
    assert (enc.Width, enc.Height) == (160, 120)
    y = np.full((120, 160), 70, np.uint8)
    uv = np.full((60, 160), 128, np.uint8)
    surf = vali.Surface.Make(F.NV12, 160, 120)
    up = vali.PyFrameUploader(gpu_id=0)
    assert up.Run(np.concatenate([y.reshape(-1), uv.reshape(-1)]), surf)[0]
    pkt2 = np.zeros(0, dtype=np.uint8)
    enc.EncodeSingleSurface(surf, pkt2)
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    data = pkt2.tobytes() + flush.tobytes()
    assert data
    p = tmp_path / "small.h264"
    p.write_bytes(data)
    redec = vali.PyDecoder(str(p), {}, gpu_id=-1)
    assert (redec.Width, redec.Height) == (160, 120)


def test_jpeg_yuv420_odd_width_mcu_pad(tmp_path):
    """Raw-YCbCr JPEG encode of a width that is not MCU(16)-aligned:
    jpeg_write_raw_data reads width_in_blocks*8 samples per row, so the
    encoder must stage rows into edge-replicated padded buffers (a heap
    overread + garbage right edge otherwise). Round-trips through the
    decoder and checks the content survives."""
    w, h = 852, 480  # chroma width 426: not a multiple of 8
    rng = np.random.default_rng(3)
    planes = [np.full((h, w), 90, np.uint8),
              rng.integers(100, 140, (h // 2, w // 2), dtype=np.uint8),
              rng.integers(100, 140, (h // 2, w // 2), dtype=np.uint8)]
    jpeg = vali.PyNvJpegEncoder(gpu_id=0)
    ctx = jpeg.Context(90, F.YUV420)
    surf = vali.Surface.Make(F.YUV420, w, h)
    up = vali.PyFrameUploader(gpu_id=0)
    from vali_tpu.memory.host import planes_to_host_frame

    ok, _ = up.Run(planes_to_host_frame(planes), surf)
    assert ok
    out, info = jpeg.Run(ctx, [surf])
    assert info == vali.TaskExecInfo.SUCCESS
    path = str(tmp_path / "odd.jpg")
    with open(path, "wb") as f:
        f.write(bytes(out[0]))
    dec = vali.PyDecoder(path, {}, gpu_id=-1)
    assert (dec.Width, dec.Height) == (w, h)
    frame = np.empty(dec.HostFrameSize, np.uint8)
    ok, _ = dec.DecodeSingleFrame(frame)
    assert ok
    y = frame[:w * h].reshape(h, w)
    # flat luma plane must come back flat right up to the true edge
    assert abs(int(y[:, -1].mean()) - 90) <= 3
    assert y.std() < 3.0


def test_p12_decode_is_p012_layout(tmp_path):
    """12-bit 4:2:0 decode must deliver PixFmt.P12 in the P012 layout the
    rest of the stack assumes (semi-planar, MSB-aligned uint16 — what the
    reference's NVDEC path produces), not FFmpeg's planar LSB yuv420p12
    (reference format map: TaskDecodeFrame.cpp:885-886)."""
    w, h = 64, 48
    rng = np.random.default_rng(7)
    y = rng.integers(0, 4096, (h, w), dtype=np.uint16)
    u = rng.integers(0, 4096, (h // 2, w // 2), dtype=np.uint16)
    v = rng.integers(0, 4096, (h // 2, w // 2), dtype=np.uint16)
    path = str(tmp_path / "p12.y4m")
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420p12\n".encode())
        f.write(b"FRAME\n")
        for pl in (y, u, v):
            f.write(pl.astype("<u2").tobytes())

    dec = vali.PyDecoder(path, {}, gpu_id=-1)
    assert dec.Format == F.P12
    buf = np.empty(dec.HostFrameSize, np.uint8)
    ok, info = dec.DecodeSingleFrame(buf)
    assert ok, info
    u16 = buf.view("<u2").reshape(h * 3 // 2, w)
    assert np.array_equal(u16[:h], y << 4)
    assert np.array_equal(u16[h:, 0::2], u << 4)
    assert np.array_equal(u16[h:, 1::2], v << 4)

    # device path: the P12 surface feeds the fused preprocess cleanly
    dec2 = vali.PyDecoder(path, {}, gpu_id=0)
    surf = vali.Surface.Make(F.P12, w, h, gpu_id=0)
    ok, info = dec2.DecodeSingleSurface(surf)
    assert ok, info
    import jax.numpy as jnp

    from vali_tpu.ops.fused import fused_preprocess

    plane = surf.to_jax().reshape(1, h * 3 // 2, w)
    rgb = np.asarray(fused_preprocess(
        (plane,), F.P12, w, h, 32, 32, planar=True))
    assert rgb.shape == (1, 3, 32, 32)
    # luma was random full-range: output must not be the all-black frame
    # the LSB-aligned misread used to produce
    assert rgb.mean() > 10


def test_p12_odd_geometry_fails_loudly(tmp_path):
    """Odd-dimension 12-bit streams cannot be expressed in the P012
    layout PixFmt.P12 promises (interleaved UV rows need 2*ceil(w/2) > w
    samples), so decode must surface UNSUPPORTED_FMT_CONV_PARAMS instead
    of mislabeling planar bytes — intentional deviation, documented in
    docs/MIGRATING.md (advisor round 3; decoder.cpp CopyFrame)."""
    rng = np.random.default_rng(7)
    for w, h in ((63, 48), (64, 47)):
        cw, ch = (w + 1) // 2, (h + 1) // 2
        y = rng.integers(0, 4096, (h, w), dtype=np.uint16)
        u = rng.integers(0, 4096, (ch, cw), dtype=np.uint16)
        v = rng.integers(0, 4096, (ch, cw), dtype=np.uint16)
        path = str(tmp_path / f"odd_{w}x{h}.y4m")
        with open(path, "wb") as f:
            f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420p12\n".encode())
            f.write(b"FRAME\n")
            for pl in (y, u, v):
                f.write(pl.astype("<u2").tobytes())
        dec = vali.PyDecoder(path, {}, gpu_id=-1)
        assert dec.Format == F.P12
        buf = np.empty(dec.HostFrameSize, np.uint8)
        ok, info = dec.DecodeSingleFrame(buf)
        assert not ok
        assert info == vali.TaskExecInfo.UNSUPPORTED_FMT_CONV_PARAMS


def _encode_packets(codec, w, h, fills):
    """Encode synthetic NV12 frames, return per-frame packets."""
    enc = vali.PyNvEncoder({"s": f"{w}x{h}", "codec": codec, "gop": "4",
                            "bitrate": "1M", "fps": "30"},
                           gpu_id=0, format=F.NV12)
    up = vali.PyFrameUploader(gpu_id=0)
    surf = vali.Surface.Make(F.NV12, w, h)
    pkt = np.zeros(0, np.uint8)
    pkts = []
    for fill in fills:
        y = np.full((h, w), fill, np.uint8)
        uv = np.full((h // 2, w), 128, np.uint8)
        up.Run(np.concatenate([y.reshape(-1), uv.reshape(-1)]), surf)
        if enc.EncodeSingleSurface(surf, pkt):
            pkts.append(pkt.tobytes())
    while enc.FlushSinglePacket(pkt) and pkt.size:
        pkts.append(pkt.tobytes())
    return pkts


def _write_ivf(path, fourcc, w, h, pkts):
    import struct

    with open(path, "wb") as f:
        f.write(b"DKIF" + struct.pack("<HH4sHHIII", 0, 32, fourcc, w, h,
                                      30, 1, len(pkts)) + b"\0" * 4)
        for i, p in enumerate(pkts):
            f.write(struct.pack("<IQ", len(p), i))
            f.write(p)


@pytest.mark.parametrize("codec,fourcc,suffix", [
    ("vp9", b"VP90", ".ivf"),
    ("vp8", b"VP80", ".ivf"),
    ("av1", b"AV01", ".ivf"),
    ("mpeg2video", None, ".m2v"),
    ("mpeg1video", None, ".m1v"),
])
def test_decode_breadth_codecs(tmp_path, codec, fourcc, suffix):
    """Decode-side parity with the reference's 10-codec cuvid map
    (TaskDecodeFrame.cpp:83-93: av1, hevc, h264, mjpeg, mpeg1/2/4, vp8,
    vp9, vc1): vp8/vp9/av1/mpeg1/mpeg2 decode round trips. Fixtures are
    produced by the encoder's beyond-reference generic-codec path and
    containered as IVF / raw elementary streams."""
    w, h = 320, 240
    fills = [50, 80, 110, 140, 170, 200]
    pkts = _encode_packets(codec, w, h, fills)
    assert pkts, f"{codec}: no packets produced"
    path = str(tmp_path / f"clip{suffix}")
    if fourcc is not None:
        _write_ivf(path, fourcc, w, h, pkts)
    else:
        with open(path, "wb") as f:
            f.write(b"".join(pkts))

    dec = vali.PyDecoder(path, {}, gpu_id=-1)
    assert (dec.Width, dec.Height) == (w, h)
    frame = np.empty(dec.HostFrameSize, np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame[:w * h].mean()))
    assert len(means) == len(fills), (codec, len(means))
    for got, want in zip(means, fills):
        assert abs(got - want) < 6.0, (codec, got, want)


def test_encoder_mux_loop_rss_stable(tmp_path):
    """Sustained encode->mux->close cycles must not grow RSS (the
    decode soak has an equivalent; this covers the encoder/muxer side)."""
    import resource

    w, h = 320, 240

    def one_cycle(i):
        enc = vali.PyNvEncoder({"s": f"{w}x{h}", "gop": "4",
                                "bitrate": "1M"}, gpu_id=0, format=F.NV12)
        up = vali.PyFrameUploader(gpu_id=0)
        surf = vali.Surface.Make(F.NV12, w, h)
        mux = vali.PyMuxer(str(tmp_path / f"s{i % 2}.mp4"), w, h, fps=30.0)
        pkt = np.zeros(0, np.uint8)
        k = 0
        for f_i in range(12):
            y = np.full((h, w), 40 + 10 * f_i, np.uint8)
            uv = np.full((h // 2, w), 128, np.uint8)
            up.Run(np.concatenate([y.reshape(-1), uv.reshape(-1)]), surf)
            if enc.EncodeSingleSurface(surf, pkt):
                assert mux.Mux(pkt, pts=k / 30.0)[0]
                k += 1
        fl = np.zeros(0, np.uint8)
        enc.Flush(fl)
        if fl.size:
            mux.Mux(fl, pts=k / 30.0)
        assert mux.Close()[0]

    for i in range(3):  # warm-up: allocators, jit caches
        one_cycle(i)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for i in range(12):
        one_cycle(i)
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert rss1 - rss0 < 40 * 1024, f"RSS grew {rss1 - rss0} KB"


def test_vp9_decode_device_path(tmp_path):
    """Breadth codecs also flow through the device-surface path with
    exact content (not just the CPU frame path)."""
    w, h = 320, 240
    pkts = _encode_packets("vp9", w, h, [60, 100, 140])
    path = str(tmp_path / "clip.ivf")
    _write_ivf(path, b"VP90", w, h, pkts)
    dec = vali.PyDecoder(path, {}, gpu_id=0)
    surf = vali.Surface.Make(dec.Format, w, h, gpu_id=0)
    means = []
    while dec.DecodeSingleSurface(surf)[0]:
        means.append(float(np.asarray(surf.plane_arrays()[0]).mean()))
    assert [round(m) for m in means] == [60, 100, 140]


# ---------------------------------------------------------------------------
# HEVC-side observable-option matrix (mirrors the h264 assertions above;
# parity: NvCodecCliOptions.cpp:85-107 applies the same keys per codec)
# ---------------------------------------------------------------------------

def _hevc_nal_types(es):
    out, i = [], 0
    while True:
        i = es.find(b"\x00\x00\x01", i)
        if i < 0:
            return out
        out.append((es[i + 3] >> 1) & 0x3F)
        i += 3


def test_encoder_gop_observable_hevc():
    """gop=4 on hevc must yield an IRAP every 4 frames in the bitstream
    (HEVC NAL types 16..23; x265 emits IDR_W_RADL=19/IDR_N_LP=20)."""
    es = _encode_es({"s": f"{W}x{H}", "codec": "hevc", "gop": "4",
                     "bf": "0", "lookahead": "0"}, n_frames=12)
    nals = _hevc_nal_types(es)
    iraps = sum(1 for t in nals if 16 <= t <= 23)
    assert iraps == 3, nals


def test_encoder_profile_observable_hevc(tmp_path):
    """HEVC profile must land in the stream: Main (1) for 8-bit NV12,
    Main10 (2) for YUV420_10bit input, as reported by the decoder."""
    from vali_tpu.memory.host import planes_to_host_frame

    es8 = _encode_es({"s": f"{W}x{H}", "codec": "hevc", "gop": "4"},
                     n_frames=4)
    p8 = tmp_path / "main.h265"
    p8.write_bytes(es8)
    assert vali.PyDecoder(str(p8), {}, gpu_id=-1).Profile == 1  # Main

    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "codec": "hevc", "gop": "1"},
                           gpu_id=0, format=F.YUV420_10bit)
    up = vali.PyFrameUploader(gpu_id=0)
    chunks = []
    pkt = np.zeros(0, np.uint8)
    for fill in (256, 640):
        planes = [np.full((H, W), fill, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16)]
        surf = vali.Surface.Make(F.YUV420_10bit, W, H)
        assert up.Run(planes_to_host_frame(planes), surf)[0]
        if enc.EncodeSingleSurface(surf, pkt):
            chunks.append(pkt.tobytes())
    flush = np.zeros(0, np.uint8)
    enc.Flush(flush)
    p10 = tmp_path / "main10.h265"
    p10.write_bytes(b"".join(chunks) + flush.tobytes())
    dec10 = vali.PyDecoder(str(p10), {}, gpu_id=-1)
    # 10-bit input must NOT be squeezed into 8-bit Main: the stream
    # carries a 10-bit-capable profile — Main10 (2) or, as this libx265
    # build labels its auto-selected 10-bit profile, Rext (4) — and
    # decodes back as 10-bit.
    assert dec10.Profile in (2, 4), dec10.Profile
    assert dec10.Format == F.YUV420_10bit


def test_encoder_10bit_roundtrip_hevc(tmp_path):
    """10-bit HEVC (x265 main10) encode -> decode round trip with value
    fidelity (the 10-bit path the reference serves via NVENC main10)."""
    from vali_tpu.memory.host import planes_to_host_frame

    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "codec": "hevc",
                            "bitrate": "2M", "gop": "1"},
                           gpu_id=0, format=F.YUV420_10bit)
    fills = [150, 512, 900]
    up = vali.PyFrameUploader(gpu_id=0)
    chunks = []
    pkt = np.zeros(0, np.uint8)
    for fill in fills:
        planes = [np.full((H, W), fill, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16),
                  np.full((H // 2, W // 2), 512, np.uint16)]
        surf = vali.Surface.Make(F.YUV420_10bit, W, H)
        assert up.Run(planes_to_host_frame(planes), surf)[0]
        if enc.EncodeSingleSurface(surf, pkt):
            chunks.append(pkt.tobytes())
    flush = np.zeros(0, np.uint8)
    enc.Flush(flush)
    es = tmp_path / "ten.h265"
    es.write_bytes(b"".join(chunks) + flush.tobytes())

    dec = vali.PyDecoder(str(es), {}, gpu_id=-1)
    assert dec.Format == F.YUV420_10bit
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame.view(np.uint16)[:W * H].mean()))
    assert len(means) == len(fills)
    for got, want in zip(means, fills):
        assert abs(got - want) < 8.0


def test_encoder_capability_limits_honest(tmp_path):
    """Capabilities must not promise what the codec build can't do:
    encode one frame at the claimed WIDTH_MAX x HEIGHT_MAX and at
    WIDTH_MIN x HEIGHT_MIN, and decode the big one back."""
    caps = vali.PyNvEncoder({"s": f"{W}x{H}"}, gpu_id=0).Capabilities
    wmax, hmax = caps[vali.NV_ENC_CAPS.WIDTH_MAX], \
        caps[vali.NV_ENC_CAPS.HEIGHT_MAX]
    wmin, hmin = caps[vali.NV_ENC_CAPS.WIDTH_MIN], \
        caps[vali.NV_ENC_CAPS.HEIGHT_MIN]
    up = vali.PyFrameUploader(gpu_id=0)
    for w, h in ((wmax, hmax), (wmin, hmin)):
        enc = vali.PyNvEncoder({"s": f"{w}x{h}", "preset": "P1",
                                "gop": "1"}, gpu_id=0, format=F.NV12)
        y = np.full((h, w), 100, np.uint8)
        uv = np.full((h // 2, w), 128, np.uint8)
        surf = vali.Surface.Make(F.NV12, w, h)
        assert up.Run(np.concatenate([y.reshape(-1), uv.reshape(-1)]),
                      surf)[0]
        pkt = np.zeros(0, np.uint8)
        enc.EncodeSingleSurface(surf, pkt)
        flush = np.zeros(0, np.uint8)
        enc.Flush(flush)
        es = pkt.tobytes() + flush.tobytes()
        assert es, (w, h)
        p = tmp_path / f"{w}x{h}.h264"
        p.write_bytes(es)
        dec = vali.PyDecoder(str(p), {}, gpu_id=-1)
        assert (dec.Width, dec.Height) == (w, h)
        out = np.zeros(dec.HostFrameSize, np.uint8)
        assert dec.DecodeSingleFrame(out)[0]
        assert abs(float(out[:w * h].mean()) - 100) < 2.0


def test_encoder_sync_packet_arrival_contract():
    """Pin the documented sync=True contract (encoder.py:133-140):
    packet arrival follows the codec's frame-delay queue identically for
    sync=True and sync=False (libavcodec cannot drain a single frame
    mid-stream, matching NVENC's async frame queue), and a delayed
    configuration returns False (empty packet) until the queue fills."""
    arrivals = {}
    for sync in (False, True):
        enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bf": "0",
                                "lookahead": "0", "gop": "4"},
                               gpu_id=0, format=F.NV12)
        pkt = np.zeros(0, np.uint8)
        seq = []
        for i in range(8):
            ok = enc.EncodeSingleSurface(nv12_surface(60 + 10 * i), pkt,
                                         sync=sync)
            assert ok == bool(pkt.size), (sync, i)
            seq.append(ok)
        arrivals[sync] = seq
        assert any(seq), (sync, seq)
    assert arrivals[True] == arrivals[False], arrivals

    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bf": "2", "gop": "30",
                            "lookahead": "4"}, gpu_id=0, format=F.NV12)
    pkt = np.zeros(0, np.uint8)
    first = enc.EncodeSingleSurface(nv12_surface(80), pkt, sync=True)
    assert not first and not pkt.size


def test_encode_single_frame_matches_surface_path():
    """EncodeSingleFrame (beyond reference: host-frame input, zero
    device round trips) must produce byte-identical bitstreams to the
    EncodeSingleSurface path for the same input frames — it IS the same
    native encoder fed the same bytes. Also the synthesize_clip /
    bench-outage dependency: this path must never touch JAX."""
    w, h = 96, 64
    opts = {"s": f"{w}x{h}", "gop": "8", "bf": "0", "lookahead": "0",
            "bitrate": "1M", "fps": "30"}
    frames = []
    rng = np.random.default_rng(3)
    for i in range(6):
        y = np.full((h, w), 40 + 25 * i, np.uint8)
        y[16:32, 16:48] = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        uv = np.full((h // 2, w), 128, np.uint8)
        frames.append(np.concatenate([y.reshape(-1), uv.reshape(-1)]))

    def run_surface():
        enc = vali.PyNvEncoder(opts, gpu_id=0, format=F.NV12)
        up = vali.PyFrameUploader(gpu_id=0)
        pkt = np.zeros(0, np.uint8)
        out = []
        for f in frames:
            surf = vali.Surface.Make(F.NV12, w, h)
            assert up.Run(f, surf)[0]
            if enc.EncodeSingleSurface(surf, pkt):
                out.append(pkt.tobytes())
        while enc.FlushSinglePacket(pkt) and pkt.size:
            out.append(pkt.tobytes())
        return out

    def run_frame():
        enc = vali.PyNvEncoder(opts, gpu_id=0, format=F.NV12)
        pkt = np.zeros(0, np.uint8)
        out = []
        for f in frames:
            if enc.EncodeSingleFrame(f, pkt):
                out.append(pkt.tobytes())
        while enc.FlushSinglePacket(pkt) and pkt.size:
            out.append(pkt.tobytes())
        return out

    assert run_frame() == run_surface()

    # size-mismatch contract
    enc = vali.PyNvEncoder(opts, gpu_id=0, format=F.NV12)
    pkt = np.zeros(0, np.uint8)
    with pytest.raises(RuntimeError, match="encoder expects"):
        enc.EncodeSingleFrame(frames[0][:-1], pkt)


def test_reconfigure_invalid_size_rejected_and_state_intact():
    """A partial/garbage 's' must be rejected up front (INVALID_INPUT)
    without half-applying it, and the encoder must stay fully usable at
    its original geometry."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bitrate": "1M"}, gpu_id=0)
    for bad in ("320", "0x0", "-16x-16", "junk"):
        assert not enc.Reconfigure({"s": bad}, reset_encoder=True), bad
    assert (enc.Width, enc.Height) == (W, H)
    packet = np.zeros(0, dtype=np.uint8)
    wrote = []
    for i in range(6):
        if enc.EncodeSingleSurface(nv12_surface(70 + 10 * i), packet):
            wrote.append(packet.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    assert (b"".join(wrote) + flush.tobytes())  # real bitstream came out


def test_reconfigure_open_failure_is_not_a_crash():
    """When the reopen inside Reconfigure fails (odd size for 4:2:0),
    the encoder must roll back to a fully-closed state: the next encode
    reports failure instead of dereferencing a half-open context."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bitrate": "1M"}, gpu_id=0)
    with pytest.raises(RuntimeError):
        enc.Reconfigure({"s": "101x101"}, reset_encoder=True)
    frame = np.zeros(enc.FrameSizeInBytes, dtype=np.uint8)
    packet = np.zeros(0, dtype=np.uint8)
    assert enc.EncodeSingleFrame(frame, packet) is False  # graceful


def _encode_es_native_force(opts, force_at, n_frames=8):
    """Encode via the native per-frame force_idr entry point."""
    from vali_tpu.memory.host import planes_to_host_frame

    enc = vali.PyNvEncoder(opts, gpu_id=0)
    chunks = []
    for i in range(n_frames):
        frame = planes_to_host_frame(
            nv12_surface(60 + 12 * i).plane_arrays())
        info, _ = enc._enc.encode(frame, i == force_at, None)
        assert vali.TaskExecInfo(info) == vali.TaskExecInfo.SUCCESS
        while True:
            data = enc._enc.pop_packet()
            if data is None:
                break
            chunks.append(bytes(data))
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    return b"".join(chunks) + flush.tobytes()


def test_forced_idr_native_is_idr_h264():
    """Per-frame force_idr must produce a true mid-GOP IDR (NAL 5) for
    H.264 — libx264 gates this behind 'forced-idr' (NVENC contract)."""
    es = _encode_es_native_force(
        {"s": f"{W}x{H}", "gop": "250", "bf": "0", "lookahead": "0"},
        force_at=4)
    nals = _h264_nal_types(es)
    assert nals.count(5) >= 2, nals  # stream start + the forced frame


def test_forced_idr_native_is_idr_hevc():
    """HEVC per-frame force_idr yields a TRUE mid-GOP IDR (NAL 19/20),
    not a CRA: the encoder sets 'forced-idr' AND closes the GOP (x265's
    open-GOP default demotes forced IDRs to CRA) — closed GOP is NVENC
    parity anyway."""
    es = _encode_es_native_force(
        {"s": f"{W}x{H}", "codec": "hevc", "gop": "250", "bf": "0",
         "lookahead": "0"}, force_at=4)
    nals = _hevc_nal_types(es)
    idrs = sum(1 for t in nals if t in (19, 20))
    assert idrs >= 2, nals  # stream start + the forced frame
