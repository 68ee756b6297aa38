"""Part-file naming shared by the custom two-phase file sinks.

Both the Avro and the catalog-JSON sink publish task temp files as
``part-NNNNN.<ext>`` via atomic rename at commit time. Naming is the
only coordination between batches (no manifest on these landing-zone
sinks), so it has to be collision-proof on its own:

- The base index is ``max(existing part index) + 1``, never a FILE
  COUNT: a gap in the sequence (an externally deleted part, a foreign
  file matching the extension) makes count < max index + 1, and a
  count-based name would ``os.replace`` straight over a committed part
  — silent data loss.
- Committed messages are numbered COMPACTLY over the non-None entries:
  the Python Data Source API can hand ``commit()`` a None per
  empty/skipped task, and ``enumerate`` over the raw list would burn
  an index per None, leaving holes that the next append's count-based
  base (the old bug) would then collide into.

Single-writer-per-batch stays the contract, as for any file sink
without a manifest; the snapshot store is the multi-writer path.
"""

from __future__ import annotations

import os

__all__ = ["existing_parts", "next_part_index"]


def existing_parts(path: str, ext: str) -> list[str]:
    """Committed ``part-*.<ext>`` file names in ``path`` (no temps)."""
    return [
        f
        for f in os.listdir(path)
        if f.endswith(ext) and f.startswith("part-")
    ]


def next_part_index(path: str, ext: str) -> int:
    """First part index that cannot collide with any committed file:
    max over existing ``part-NNNNN.<ext>`` indices, plus one. Files
    with the extension but a non-parsable stem are ignored for the max
    (they can't collide with ``part-NNNNN`` names we generate)."""
    best = -1
    for f in existing_parts(path, ext):
        stem = f[len("part-") : -len(ext)].rstrip(".")
        try:
            best = max(best, int(stem))
        except ValueError:
            continue
    return best + 1
