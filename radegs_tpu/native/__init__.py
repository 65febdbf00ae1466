from radegs_tpu.native.build import load_native

__all__ = ["load_native"]
