from .jsonl import export_jsonl, items_to_entries
from .mail import build_messages

__all__ = ["export_jsonl", "items_to_entries", "build_messages"]
