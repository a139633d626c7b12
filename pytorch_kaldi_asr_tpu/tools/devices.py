"""Accelerator inventory (role of the reference's nvidia-smi scraper,
pytorch/utils/get_gpu.py:4-14).  On TPU there is no occupancy race to probe —
``jax.devices()`` is authoritative; this reports what's attached and basic
memory stats where the platform exposes them."""

from __future__ import annotations


def available_devices():
    """List of dicts describing attached accelerator devices."""
    import jax

    out = []
    for d in jax.devices():
        entry = {
            "id": d.id,
            "platform": d.platform,
            "kind": getattr(d, "device_kind", "unknown"),
            "process": d.process_index,
        }
        try:
            stats = d.memory_stats()
            if stats:
                entry["bytes_in_use"] = stats.get("bytes_in_use")
                entry["bytes_limit"] = stats.get("bytes_limit")
        except Exception:
            pass
        out.append(entry)
    return out


def main(argv=None):
    for entry in available_devices():
        print(entry)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
