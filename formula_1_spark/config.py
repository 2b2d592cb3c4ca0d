"""Engine configuration.

Replaces the reference's scattered knobs (hardcoded ``Pacific/Auckland``
timezone at ``Notebooks/Clean Bronze Data.py:26-28``, ADF
``globalParameters`` at ``Data Factory/factory/df-formula-1.json:4-25``,
mount points at ``Notebooks/File Systems Utils.py:4-44``) with one plain
dataclass. No cloud mounts: the lake is a configurable local/posix (or any
Hadoop-FS-compatible) root.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # Lake layout (medallion). Each layer is a directory of snapshot dirs.
    lake_root: str = os.environ.get("SPARK_GRAFT_LAKE", "/tmp/f1_lake")
    # Audit timestamp timezone — reference default kept (quirk #7).
    ingestion_tz: str = "Pacific/Auckland"
    # Data-availability gates (reference C4: laps >= 1996, pitstops >= 2012).
    laps_min_year: int = 1996
    pitstops_min_year: int = 2012
    # Scale knobs.
    shuffle_partitions: int = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    broadcast_threshold_bytes: int = 64 * 1024 * 1024
    # Parity flag: reference's lossy inner pitstop join (quirk #3).
    lossy_pitstop_join: bool = True

    @property
    def bronze(self) -> str:
        return os.path.join(self.lake_root, "bronze")

    @property
    def silver(self) -> str:
        return os.path.join(self.lake_root, "silver")

    @property
    def gold(self) -> str:
        return os.path.join(self.lake_root, "gold")


DEFAULT_CONFIG = EngineConfig()
