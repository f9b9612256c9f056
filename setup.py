"""Build the vali-tpu native engine (_native extension).

Usage: python3 setup.py build_ext --inplace
The extension links against system FFmpeg (libavformat/avcodec/avutil/
swscale) and libjpeg. TPU compute never goes through this module — it is
the host-side demux/decode/encode engine only.
"""

import subprocess

from setuptools import Extension, setup


def pkg_config(packages, kind):
    flag = {"cflags": "--cflags", "libs": "--libs"}[kind]
    out = subprocess.check_output(["pkg-config", flag] + packages, text=True)
    return out.split()


FFMPEG_PKGS = ["libavformat", "libavcodec", "libavutil", "libswscale"]

include_dirs = []
library_dirs = []
libraries = ["jpeg"]
for token in pkg_config(FFMPEG_PKGS, "cflags"):
    if token.startswith("-I"):
        include_dirs.append(token[2:])
for token in pkg_config(FFMPEG_PKGS, "libs"):
    if token.startswith("-L"):
        library_dirs.append(token[2:])
    elif token.startswith("-l"):
        libraries.append(token[2:])

ext = Extension(
    "vali_tpu._native",
    sources=[
        "src/native/module.cpp",
        "src/native/module_codecs.cpp",
        "src/native/decoder.cpp",
        "src/native/encoder.cpp",
        "src/native/frameconv.cpp",
        "src/native/jpeg.cpp",
        "src/native/muxer.cpp",
    ],
    include_dirs=["src/native"] + include_dirs,
    library_dirs=library_dirs,
    libraries=libraries,
    extra_compile_args=["-std=c++17", "-O2", "-fvisibility=hidden"],
    language="c++",
)

setup(
    name="vali-tpu",
    version="0.1.0",
    packages=["vali_tpu"],
    ext_modules=[ext],
)
