from .jsonl import read_jsonl, read_jsonl_with_lines, write_jsonl

__all__ = ["read_jsonl", "read_jsonl_with_lines", "write_jsonl"]
