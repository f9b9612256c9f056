"""Smoke-run every sample script (keeps samples/ from rotting).

Runs each via subprocess on the CPU backend against the reference clip
when the checkout is present, else against an equivalent clip (848x464,
96 frames, 30 fps) synthesized with our own encoder+muxer — so the
samples stay exercised in the repo's own CI too.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_CLIP = "/root/reference/tests/data/test.mp4"

ENV = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")


@pytest.fixture(scope="session")
def CLIP(tmp_path_factory):
    if os.path.exists(REF_CLIP):
        return REF_CLIP
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from soak_decode import synthesize_clip

    return synthesize_clip(
        str(tmp_path_factory.mktemp("samples") / "clip.mp4"))


def run_sample(name, *args, timeout=180):
    proc = subprocess.run(
        [sys.executable, os.path.join("samples", name), *args],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return proc.stdout


def test_sample_decode(CLIP):
    out = run_sample("sample_decode.py", CLIP)
    assert "decoded 96 frames" in out


def test_sample_seek(CLIP):
    out = run_sample("sample_seek.py", CLIP)
    assert "seek 1.5s" in out


def test_sample_transcode(tmp_path, CLIP):
    out_path = str(tmp_path / "out.h264")
    out = run_sample("sample_transcode.py", CLIP, out_path, "320", "180")
    assert "transcoded 96 frames" in out
    assert os.path.getsize(out_path) > 1000


def test_sample_jpeg(CLIP):
    out = run_sample("sample_jpeg.py", CLIP, "2")
    assert out.count(".jpg") >= 2


def test_sample_device_info():
    out = run_sample("get_device_info.py")
    assert "accelerators:" in out
    assert "codec" in out


def test_sample_network(CLIP):
    out = run_sample("sample_decode_from_network.py", CLIP)
    assert "decoded 60 frames" in out


def test_sample_multistream(CLIP):
    out = run_sample("sample_multistream.py", CLIP, "2", timeout=300)
    assert "fps end-to-end" in out


def test_sample_segmentation(CLIP):
    out = run_sample("sample_segmentation.py", CLIP, "1", timeout=300)
    assert "segmented" in out


def test_cli_probe_and_decode(CLIP):
    proc = subprocess.run(
        [sys.executable, "-m", "vali_tpu", "probe", CLIP],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0
    assert "848x464" in proc.stdout
    proc = subprocess.run(
        [sys.executable, "-m", "vali_tpu", "decode", CLIP, "10"],
        cwd=REPO, env=ENV, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0
    assert "decoded 10 frames" in proc.stdout


def test_sample_torch_interop(CLIP):
    pytest.importorskip("torch")
    out = run_sample("sample_torch_interop.py", CLIP, "2")
    assert "round trip OK" in out


def test_sample_multichip(CLIP):
    out = run_sample("sample_multichip.py", CLIP, "4", "2", timeout=300)
    assert "OK: 2 sharded batches across 4 devices" in out


def test_sample_profile(tmp_path):
    out = run_sample("sample_profile.py", str(tmp_path), timeout=300)
    assert "trace" in out.lower()


def test_sample_scene_detection(CLIP):
    out = run_sample("sample_scene_detection.py", CLIP)
    assert "cuts at frames:" in out and out.strip().endswith("OK")


def test_sample_hdr_tonemap():
    # self-synthesizing: no input clip needed
    out = run_sample("sample_hdr_tonemap.py", timeout=300)
    assert "tone-mapped to SDR" in out
    assert "wrote SDR stream" in out and out.strip().endswith("OK")


def test_sample_detection_preprocess(CLIP):
    out = run_sample("sample_detection_preprocess.py", CLIP, "2", "320")
    assert "scale" in out and "letterboxed" in out
