from .catalog import write_manifest, read_manifest, latest_manifest, is_complete

__all__ = ["write_manifest", "read_manifest", "latest_manifest", "is_complete"]
