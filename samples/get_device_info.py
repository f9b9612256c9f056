"""Device inventory (parity: get_hw_info.ipynb)."""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    print(f"accelerators: {vali.GetNumGpus()}")
    for i, dev in enumerate(jax.devices()):
        print(f"  [{i}] {dev.device_kind} ({dev.platform})")
    print("encoder options:")
    for key, doc in sorted(vali.GetNvencParams().items()):
        print(f"  {key:14s} {doc}")


if __name__ == "__main__":
    main()
