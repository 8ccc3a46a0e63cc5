"""Per-partition lineage manifests: the resumability substrate.

Replaces the reference's mutable-triplestore incremental semantics
(/root/reference/lib/sparql_update.rb:17-99, delete-before-insert per record)
with partition-level recompute (SURVEY.md §2.8): each output partition
records (input signature, rule-set hash, triple counts); a re-run whose
manifest matches is skipped; anything else is recomputed and atomically
replaced (write temp + rename).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class RunManifest:
    input_signature: str
    ruleset_hash: str
    num_partitions: int
    triple_count: int = 0
    partition_counts: dict = field(default_factory=dict)
    extra: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True, indent=1)


def input_signature(paths: list[str]) -> str:
    """Stable signature over input files: (path, size, mtime) triples.
    At multi-node scale this comes from the object-store listing, which is
    already consistent; content hashing would re-read 100 TB."""
    parts = []
    for p in sorted(paths):
        try:
            st = os.stat(p)
            parts.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(f"{p}:missing")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def list_input_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _, names in os.walk(path):
        for n in names:
            if n.endswith((".parquet", ".pq")):
                out.append(os.path.join(root, n))
    return sorted(out)


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def write_manifest(out_dir: str, manifest: RunManifest) -> None:
    """Atomic: temp file + rename (SURVEY.md §7.4 manifest atomicity)."""
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        f.write(manifest.to_json())
    os.replace(tmp, manifest_path(out_dir))


def read_manifest(out_dir: str) -> Optional[RunManifest]:
    try:
        with open(manifest_path(out_dir)) as f:
            return RunManifest(**json.load(f))
    except (OSError, ValueError, TypeError):
        return None


def matches(existing: Optional[RunManifest], sig: str, ruleset_hash: str) -> bool:
    return (
        existing is not None
        and existing.input_signature == sig
        and existing.ruleset_hash == ruleset_hash
    )
