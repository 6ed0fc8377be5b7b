from .catalog import write_manifest, read_manifest, latest_manifest, is_complete

__all__ = ["write_manifest", "read_manifest", "latest_manifest", "is_complete"]
from .convert import compile_transform, parse_sft, read_delimited, read_json, sft_to_schema  # noqa: E402,F401
from .export import bin_records, export, pack_bin, to_arrow_ipc, to_geojson_lines  # noqa: E402,F401

__all__ += [
    "parse_sft", "sft_to_schema", "read_delimited", "read_json", "compile_transform",
    "export", "to_geojson_lines", "bin_records", "pack_bin", "to_arrow_ipc",
]
