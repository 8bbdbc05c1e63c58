from pointcloudprocessing_tpu.utils.native import crc32c, native_available

__all__ = ["crc32c", "native_available"]
