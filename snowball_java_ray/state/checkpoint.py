"""Per-partition lineage manifests (north rule: checkpoint-resumable
with per-partition lineage + metrics).

Replaces the reference's all-or-nothing whole-object Java serialization
checkpoints (/root/reference/snowball/src/bin/SnowballConfig.java:138-167,
bin/Snowball.java:45-71) with a JSON manifest of completed partitions:
each entry records the partition's input range, row/posting counts,
output bytes and wall time. Writes are atomic (tmp + rename); a resumed
run skips partitions whose entry is ``done`` and whose output file
exists."""

from __future__ import annotations

import json
import os
import time


class Manifest:
    def __init__(self, out_dir: str, name: str = "manifest.json"):
        self.path = os.path.join(out_dir, name)
        os.makedirs(out_dir, exist_ok=True)
        self.entries: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.entries = json.load(f)

    def is_done(self, partition_id: str, output_file: str | None = None) -> bool:
        e = self.entries.get(partition_id)
        if not e or e.get("state") != "done":
            return False
        return output_file is None or os.path.exists(output_file)

    def mark_done(self, partition_id: str, **metrics) -> None:
        self.entries[partition_id] = {
            "state": "done",
            "completed_unix": time.time(),
            **metrics,
        }
        self._flush()

    def _flush(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
