"""Muxer tests + the decoder coverage it unlocks: true-VFR fixtures and
long-GOP seek accuracy (reference test_PyDecoder.py:986-1004 leaves the
VFR-true assertion commented out for lack of a fixture; TaskDecodeFrame
rejects seek-by-frame-number on VFR at decoder.cpp:351-355)."""

import os

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.engine.muxer import PyMuxer

F = vali.PixelFormat
W, H = 320, 240


def nv12_surface(y_fill):
    y = np.full((H, W), y_fill % 256, np.uint8)
    uv = np.full((H // 2, W), 128, np.uint8)
    frame = np.concatenate([y.reshape(-1), uv.reshape(-1)])
    surf = vali.Surface.Make(F.NV12, W, H)
    up = vali.PyFrameUploader(gpu_id=0)
    ok, _ = up.Run(frame, surf)
    assert ok
    return surf


def encode_display_order_packets(n_frames, gop=4, fills=None):
    """bf=0 + lookahead=0 -> output packet order == display order."""
    enc = vali.PyNvEncoder({"s": f"{W}x{H}", "bf": "0", "lookahead": "0",
                            "gop": str(gop)}, gpu_id=0, format=F.NV12)
    pkts = []
    pkt = np.zeros(0, np.uint8)
    for i in range(n_frames):
        fill = fills[i] if fills else 40 + 15 * i
        if enc.EncodeSingleSurface(nv12_surface(fill), pkt):
            pkts.append(pkt.tobytes())
    while True:
        f = np.zeros(0, np.uint8)
        if not enc.FlushSinglePacket(f) or not f.size:
            break
        pkts.append(f.tobytes())
    assert len(pkts) == n_frames
    return pkts


@pytest.mark.parametrize("ext", [".mp4", ".mkv", ".ts"])
def test_muxer_cfr_roundtrip(tmp_path, ext):
    pkts = encode_display_order_packets(12)
    p = str(tmp_path / f"cfr{ext}")
    with PyMuxer(p, W, H, fps=30.0) as mux:
        for i, d in enumerate(pkts):
            ok, info = mux.Mux(d, pts=i / 30.0, key=(i % 4 == 0))
            assert ok, (i, info)
    dec = vali.PyDecoder(p, {}, gpu_id=-1)
    assert (dec.Width, dec.Height) == (W, H)
    assert not dec.IsVFR
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame[:W * H].mean()))
    assert len(means) == 12
    for i, m in enumerate(means):
        assert abs(m - (40 + 15 * i)) < 3.0, (i, m)


@pytest.mark.parametrize("fps", [30000 / 1001, (30000, 1001)])
def test_muxer_ntsc_rate_is_cfr(tmp_path, fps):
    """fps=30000/1001 must be declared as the exact rational (av_d2q
    style), not millihertz-quantized to 2997/100 — the mismatch against
    the timestamp-derived r_frame_rate made CFR NTSC content decode as
    IsVFR=True. Accepts a float or an explicit (num, den) pair."""
    pkts = encode_display_order_packets(12)
    p = str(tmp_path / "ntsc.mp4")
    with PyMuxer(p, W, H, fps=fps) as mux:
        for i, d in enumerate(pkts):
            # 1001/30000 s = exactly 3003 ticks at the 90 kHz timebase
            assert mux.Mux(d, pts=i * 1001 / 30000, key=(i % 4 == 0))[0]
    dec = vali.PyDecoder(p, {}, gpu_id=-1)
    assert not dec.IsVFR
    assert abs(dec.AvgFramerate - 30000 / 1001) < 1e-3


@pytest.mark.parametrize("fps", [(30, 0), (0, 1), (-30, 1), (30, -1)])
def test_muxer_rejects_degenerate_fps_rational(tmp_path, fps):
    """The native layer only guards fps_num; a zero/negative denominator
    would install AVRational{n, 0} as avg_frame_rate and poison every
    duration computed from it. The wrapper must reject the pair."""
    with pytest.raises(ValueError, match="fps rational"):
        PyMuxer(str(tmp_path / "bad.mp4"), W, H, fps=fps)


def test_muxer_closed_rejects_write(tmp_path):
    p = str(tmp_path / "x.mp4")
    mux = PyMuxer(p, W, H)
    pkts = encode_display_order_packets(1, gop=1)
    assert mux.Mux(pkts[0], pts=0.0, key=True)[0]
    mux.Close()
    ok, info = mux.Mux(pkts[0], pts=1.0)
    assert not ok and info == vali.TaskExecInfo.FAIL


def make_vfr_clip(tmp_path, n_frames=24):
    """True-VFR fixture: alternate 1/30s and 1/10s frame gaps."""
    pkts = encode_display_order_packets(n_frames)
    pts = [0.0]
    for i in range(1, n_frames):
        pts.append(pts[-1] + (1 / 30.0 if i % 2 else 1 / 10.0))
    p = str(tmp_path / "vfr.mp4")
    with PyMuxer(p, W, H) as mux:
        for i, d in enumerate(pkts):
            assert mux.Mux(d, pts=pts[i], key=(i % 4 == 0))[0]
    return p


def test_vfr_detected(tmp_path):
    """A genuinely variable-frame-rate clip must report IsVFR=True (the
    reference asserts the False case only, test_PyDecoder.py:999-1004)."""
    p = make_vfr_clip(tmp_path)
    dec = vali.PyDecoder(p, {}, gpu_id=-1)
    assert dec.IsVFR
    # CFR control: same pipeline, regular timestamps
    dec2 = vali.PyDecoder("/root/reference/tests/data/test.mp4", {},
                          gpu_id=-1) \
        if os.path.exists("/root/reference/tests/data/test.mp4") else None
    if dec2 is not None:
        assert not dec2.IsVFR


def test_vfr_rejects_seek_by_frame_number(tmp_path):
    """Seek by frame number is ill-defined on VFR streams; parity with
    TaskDecodeFrame.cpp:960-965 -> NOT_SUPPORTED, and seek-by-time still
    works."""
    p = make_vfr_clip(tmp_path)
    dec = vali.PyDecoder(p, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    pkt = vali.PacketData()
    ok, info = dec.DecodeSingleFrame(
        frame, pkt, seek_ctx=vali.SeekContext(seek_frame=8))
    assert not ok
    assert info == vali.TaskExecInfo.NOT_SUPPORTED
    ok, info = dec.DecodeSingleFrame(
        frame, pkt, seek_ctx=vali.SeekContext(seek_ts=0.5))
    assert ok, info


def test_long_gop_seek_accuracy(tmp_path):
    """Seek into the middle of a long GOP must land on exactly the
    requested frame (codec reopen + decode-forward path,
    TaskDecodeFrame.cpp:944-1029; window math :975-981)."""
    n, gop, fps = 64, 32, 30.0
    fills = [(37 * i) % 200 + 20 for i in range(n)]
    pkts = encode_display_order_packets(n, gop=gop, fills=fills)
    p = str(tmp_path / "longgop.mp4")
    # key flags deliberately omitted: the muxer must detect real IDRs
    # itself (x264 scenecut moves keyframes off the gop cadence, and a
    # wrong sync-sample table silently breaks container seeking)
    with PyMuxer(p, W, H, fps=fps) as mux:
        for i, d in enumerate(pkts):
            assert mux.Mux(d, pts=i / fps)[0]

    # sequential decode ground truth
    dec = vali.PyDecoder(p, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    seq_means = []
    while dec.DecodeSingleFrame(frame)[0]:
        seq_means.append(float(frame[:W * H].mean()))
    assert len(seq_means) == n

    for target in (45, 33, 63, 7):  # deep into GOPs, both halves
        dec = vali.PyDecoder(p, {}, gpu_id=-1)
        pkt = vali.PacketData()
        ok, info = dec.DecodeSingleFrame(
            frame, pkt, seek_ctx=vali.SeekContext(seek_frame=target))
        assert ok, (target, info)
        got = float(frame[:W * H].mean())
        assert abs(got - seq_means[target]) < 0.5, (
            target, got, seq_means[target])


@pytest.mark.parametrize("codec,container", [
    ("vp9", ".webm"), ("vp8", ".webm"), ("av1", ".mkv")])
def test_mux_vpx_av1_roundtrip(tmp_path, codec, container):
    """Beyond-reference: VP8/VP9/AV1 AUs mux into WebM/MKV and decode
    back with correct count and content (key frames detected from the
    bitstream for VP8/VP9; AV1 relies on the caller's key flag)."""
    from tests.test_codecs import _encode_packets

    w, h = 320, 240
    fills = [50, 90, 130, 170]
    pkts = _encode_packets(codec, w, h, fills)
    assert len(pkts) == len(fills)
    path = str(tmp_path / f"clip{container}")
    mux = vali.PyMuxer(path, w, h, codec=codec, fps=30.0)
    for i, p in enumerate(pkts):
        ok, info = mux.Mux(p, pts=i / 30.0, key=(i == 0))
        assert ok, info
    assert mux.Close()[0]

    dec = vali.PyDecoder(path, {}, gpu_id=-1)
    assert (dec.Width, dec.Height) == (w, h)
    frame = np.empty(dec.HostFrameSize, np.uint8)
    means = []
    while dec.DecodeSingleFrame(frame)[0]:
        means.append(float(frame[:w * h].mean()))
    assert len(means) == len(fills)
    for got, want in zip(means, fills):
        assert abs(got - want) < 6.0


def test_mux_opts_faststart(tmp_path):
    """Muxer AVOptions pass through to the container writer: faststart
    relocates the moov atom before mdat (web-streamable MP4)."""
    from tests.test_codecs import _encode_packets

    w, h = 320, 240
    pkts = _encode_packets("h264", w, h, [60, 90, 120, 150])
    paths = {}
    for name, opts in (("plain", None), ("fast", {"movflags": "faststart"})):
        p = str(tmp_path / f"{name}.mp4")
        mux = vali.PyMuxer(p, w, h, fps=30.0, opts=opts)
        for i, pkt in enumerate(pkts):
            assert mux.Mux(pkt, pts=i / 30.0)[0]
        assert mux.Close()[0]
        data = open(p, "rb").read()
        paths[name] = (data.find(b"moov"), data.find(b"mdat"))
    assert paths["plain"][0] > paths["plain"][1]  # moov after mdat
    assert paths["fast"][0] < paths["fast"][1]    # faststart: moov first
    # both stay decodable
    dec = vali.PyDecoder(str(tmp_path / "fast.mp4"), {}, gpu_id=-1)
    frame = np.empty(dec.HostFrameSize, np.uint8)
    n = 0
    while dec.DecodeSingleFrame(frame)[0]:
        n += 1
    assert n == len(pkts)


def test_probe_muxed_webm(tmp_path):
    """PyDecoder.Probe reads back sensible StreamParams from a WebM this
    muxer wrote."""
    from tests.test_codecs import _encode_packets

    w, h = 320, 240
    pkts = _encode_packets("vp9", w, h, [60, 90, 120])
    path = str(tmp_path / "probe.webm")
    mux = vali.PyMuxer(path, w, h, codec="vp9", fps=30.0)
    for i, p in enumerate(pkts):
        assert mux.Mux(p, pts=i / 30.0, key=(i == 0))[0]
    assert mux.Close()[0]
    params = vali.PyDecoder.Probe(path)
    assert len(params) == 1
    assert (params[0].width, params[0].height) == (w, h)


@pytest.mark.parametrize("codec", ["h264", "hevc", "vp9", "av1"])
def test_mux_garbage_packets_no_crash(tmp_path, codec):
    """Arbitrary bytes through the muxer (bad encoders, corrupt streams)
    must fail softly or produce an unplayable file — never crash."""
    rng = np.random.default_rng(0)
    p = str(tmp_path / f"junk_{codec}.mkv")
    mux = vali.PyMuxer(p, 64, 64, codec=codec, fps=30.0)
    for i in range(4):
        blob = rng.integers(0, 256, int(rng.integers(1, 5000)),
                            dtype=np.uint8).tobytes()
        mux.Mux(blob, pts=i / 30.0, key=(i == 0))
    mux.Close()


def test_mux_unknown_option_rejected(tmp_path):
    """Typo'd/unsupported container options fail with INVALID_INPUT
    instead of being silently dropped."""
    p = str(tmp_path / "typo.mp4")
    mux = vali.PyMuxer(p, 64, 64, fps=30.0, opts={"movflag": "faststart"})
    ok, info = mux.Mux(b"\x00\x00\x01\x65" + b"\x00" * 50, pts=0.0,
                       key=True)
    assert not ok and info == vali.TaskExecInfo.INVALID_INPUT


def test_av1_malformed_obu_does_not_crash(tmp_path):
    """The AV1 sequence-header scanner parses caller-controlled bytes; a
    leb128 run past the spec's 8-byte cap (or truncated mid-size) must
    bail cleanly instead of shifting past 64 bits."""
    import vali_tpu as vali

    path = str(tmp_path / "junk.mkv")
    mux = vali.PyMuxer(path, 64, 48, codec="av1")
    # type=1 (sequence header), has_size=1, then 12 continuation bytes
    ok, info = mux.Mux(b"\x0a" + b"\xff" * 12 + b"\x00" * 8, pts=0.0,
                       key=True)
    # truncated mid-leb128
    mux.Mux(b"\x0a" + b"\x80" * 3, pts=1 / 30)
    mux.Close()  # no crash is the assertion; the file may be unplayable
