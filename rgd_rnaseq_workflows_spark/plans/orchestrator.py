"""M7 — orchestration: the reference's SLURM controller as driver code.

Reproduces the semantics of ``scripts/bulk_orchestrator_production_diskGuard
.bash`` and the two step controllers:

- **incremental skip markers** — ``.step1_complete``/``.step2_complete``
  files short-circuit completed stages (``:266-283``; written at
  ``run_SRA2QC_diskGuard.bash:172``, ``run_RNApipeline:833``). Here a stage
  is skipped when its marker exists; the marker is written only after the
  stage callable returns (artifact-then-marker, matching the reference's
  "success = artifact exists" contract).
- **small/large classification** — distinct-sample count ≤ 20 → small;
  large projects run in isolation, ≤ 4 concurrent small
  (``:33-34,255-263,339-364``). In Spark terms this is driver-side
  admission into scheduler pools; locally we model it as an execution
  ordering the test can assert on.
- **retry with backoff** — the connector-level policy (8 attempts, ×2
  backoff, capped; ``SRA2QC_production.sh:66-70,120-167``) as a reusable
  wrapper for external-kernel/ingestion stages.

What is deliberately NOT here: squeue/sacct polling (Spark's scheduler
owns task state) and disk-pressure backpressure (cluster storage is
managed; see SURVEY §4).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field


@dataclass
class Stage:
    name: str
    fn: Callable[[], object]
    # non-critical stages warn and continue, like ComputeSex
    # (run_RNApipeline:485-488) and the JBrowse session (:742-784)
    critical: bool = True


@dataclass
class ProjectRun:
    project_id: str
    n_samples: int
    stages: Sequence[Stage] = field(default_factory=list)

    def is_large(self, threshold: int = 20) -> bool:
        return self.n_samples > threshold


class Orchestrator:
    """Driver-side DAG runner with marker-based incremental skip."""

    def __init__(self, marker_dir: str, small_threshold: int = 20,
                 max_concurrent_small: int = 4):
        self.marker_dir = marker_dir
        self.small_threshold = small_threshold
        self.max_concurrent_small = max_concurrent_small
        self.log: list[tuple[str, str, str]] = []  # (project, stage, event)

    # --- markers -------------------------------------------------------
    def _marker(self, project: str, stage: str) -> str:
        return os.path.join(self.marker_dir, f"{project}.{stage}_complete")

    def is_done(self, project: str, stage: str) -> bool:
        return os.path.exists(self._marker(project, stage))

    def mark_done(self, project: str, stage: str) -> None:
        os.makedirs(self.marker_dir, exist_ok=True)
        with open(self._marker(project, stage), "w") as f:
            f.write(str(time.time()))

    def clear(self, project: str, stage: str) -> None:
        """Force a stage to re-run on the next ``run_project`` by
        removing its skip marker (the reference's regen utilities work
        exactly this way: delete the ``.stepN_complete`` file, re-run
        the controller — ``sex_json_regen_v2.sh`` re-executes the
        conflict report + track JSON + session steps independently)."""
        try:
            os.remove(self._marker(project, stage))
        except FileNotFoundError:
            pass

    # --- single project -------------------------------------------------
    def run_project(self, run: ProjectRun) -> bool:
        """Run stages in order; skip marked ones; stop on critical failure."""
        for stage in run.stages:
            if self.is_done(run.project_id, stage.name):
                self.log.append((run.project_id, stage.name, "skipped"))
                continue
            try:
                stage.fn()
            except Exception as e:  # noqa: BLE001 — stage isolation boundary
                self.log.append((run.project_id, stage.name, f"failed: {e}"))
                if stage.critical:
                    return False
                continue
            self.mark_done(run.project_id, stage.name)
            self.log.append((run.project_id, stage.name, "completed"))
        return True

    # --- multi-project admission -----------------------------------------
    def schedule(self, runs: Sequence[ProjectRun]) -> list[list[str]]:
        """Admission waves mirroring the orchestrator's policy: a large
        project runs alone; small projects run up to N at a time. Returns
        the wave structure (who ran together) and executes each run."""
        waves: list[list[str]] = []
        queue = list(runs)
        while queue:
            if queue[0].is_large(self.small_threshold):
                wave = [queue.pop(0)]
            else:
                wave = []
                while (queue and len(wave) < self.max_concurrent_small
                       and not queue[0].is_large(self.small_threshold)):
                    wave.append(queue.pop(0))
            waves.append([r.project_id for r in wave])
            for r in wave:
                self.run_project(r)
        return waves


def with_retry(fn: Callable[[], object], attempts: int = 8,
               base_delay: float = 1.0, backoff: float = 2.0,
               max_delay: float = 600.0,
               sleep: Callable[[float], None] = time.sleep):
    """The reference's prefetch retry policy (8 attempts, exponential
    backoff ×2 capped at 600 s; ``SRA2QC_production.sh:66-70,156-158``) as
    a wrapper for ingestion/external-kernel calls."""
    delay = base_delay
    last: Exception | None = None
    for _ in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — retry boundary
            last = e
            sleep(delay)
            delay = min(delay * backoff, max_delay)
    raise RuntimeError(f"all {attempts} attempts failed") from last
