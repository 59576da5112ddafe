"""Controlled-failure guard for the media decoders.

A 100 TB ingest sees truncated and corrupt files as a matter of
course; the decoder contract is: return None when the MAGIC does not
match (so sniffing chains can fall through), raise ValueError (or a
named NotImplementedError for known-unsupported features) on anything
that matched the magic but cannot be decoded. Internal parsing
naturally trips struct.error / zlib.error / IndexError on truncation —
``controlled_decode`` converts those to the contractual ValueError at
each format's entry point so callers (extract_decode_stats,
decode_and_resize, the audio/video extractors) never see a raw parser
stack. tests/test_corrupt_media.py fuzzes every fixture at many
truncation points and asserts the contract holds.
"""

from __future__ import annotations

import functools
import struct
import zlib


def controlled_decode(fmt: str):
    """Wrap a decode entry point: parser-level exceptions surface as
    ValueError('truncated or corrupt <fmt>: ...'); None (magic
    mismatch), ValueError, and NotImplementedError pass through."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (ValueError, NotImplementedError):
                raise
            except (struct.error, zlib.error, IndexError, KeyError,
                    OverflowError, MemoryError, EOFError) as ex:
                raise ValueError(
                    f"truncated or corrupt {fmt}: "
                    f"{type(ex).__name__}: {ex}"
                ) from ex

        return wrapped

    return deco
