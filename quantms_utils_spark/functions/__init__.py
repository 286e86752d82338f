from quantms_utils_spark.functions.core import (
    extract_scan_id,
    file_stem,
    label_code,
    mods_position,
    normalize_ws,
    sanitize_sequence,
)

__all__ = [
    "extract_scan_id",
    "file_stem",
    "label_code",
    "mods_position",
    "normalize_ws",
    "sanitize_sequence",
]
