"""Build the vali-tpu native engine (_native extension).

Usage: python3 setup.py build_ext --inplace
FFmpeg headers are needed at build time (pkg-config), but by default the
libav* libraries are loaded at RUNTIME via dlopen (src/native/
av_runtime.hpp) — the wheel has no hard link-time dependency on FFmpeg,
matching the reference's LibraryLoader property for its GPU libraries.
Set VALI_DIRECT_LINK=1 to link libav normally instead. libjpeg stays a
regular link dependency. TPU compute never goes through this module — it
is the host-side demux/decode/encode engine only.
"""

import os
import subprocess

from setuptools import Extension, setup


def pkg_config(packages, kind):
    flag = {"cflags": "--cflags", "libs": "--libs"}[kind]
    out = subprocess.check_output(["pkg-config", flag] + packages, text=True)
    return out.split()


FFMPEG_PKGS = ["libavformat", "libavcodec", "libavutil", "libswscale"]
DIRECT_LINK = os.environ.get("VALI_DIRECT_LINK", "").strip().lower() in (
    "1", "true", "yes", "on")

include_dirs = []
library_dirs = []
libraries = ["jpeg"]
define_macros = []
for token in pkg_config(FFMPEG_PKGS, "cflags"):
    if token.startswith("-I"):
        include_dirs.append(token[2:])
if DIRECT_LINK:
    define_macros.append(("VALI_DIRECT_LINK", "1"))
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
    define_macros=define_macros,
    extra_compile_args=["-std=c++17", "-O2", "-fvisibility=hidden"],
    language="c++",
)

setup(
    name="vali-tpu",
    version="0.1.0",
    packages=["vali_tpu"],
    ext_modules=[ext],
)
