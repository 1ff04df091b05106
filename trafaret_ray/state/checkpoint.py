"""Checkpoint / resume: partition-addressed outputs + a manifest.

"Resumable from checkpoint" for a batch pipeline (north rule) means:
stage outputs land in stage-addressed directories, written atomically
(temp dir + rename), with a manifest recording completion + row counts +
lineage metrics. A resumed job consults the manifest and re-runs only the
missing stages; within a stage, parquet part files are idempotent because
a stage re-run replaces the whole stage directory.

Two completion protocols deliberately coexist on the SAME atomic-write
invariant (tmp dir + os.replace, never append): this manifest-addressed
class (completion + metrics in one manifest.json), and the per-stage
``_SUCCESS`` markers in pipelines/flagship.py:run_flagship, where
deleting one stage's marker forces exactly that stage to recompute (an
operational affordance the manifest can't give without editing JSON).
If you change the atomic-write sequence here, change it there too.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class Checkpointer:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, 'manifest.json')
        self.manifest = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {'stages': {}}

    def _save(self):
        tmp = self.manifest_path + '.tmp'
        with open(tmp, 'w') as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def done(self, name: str) -> bool:
        return name in self.manifest['stages']

    def write_stage(self, ds, name: str, partition_cols=None,
                    metrics: dict | None = None):
        """Write a Dataset to the stage directory atomically; record in
        the manifest. No-op if the stage is already complete."""
        if self.done(name):
            return self.stage_dir(name)
        final = self.stage_dir(name)
        tmp = final + '.__tmp__'
        shutil.rmtree(tmp, ignore_errors=True)
        kwargs = {}
        if partition_cols:
            kwargs['partition_cols'] = partition_cols
        ds.write_parquet(tmp, **kwargs)
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        self.mark(name, metrics)
        return final

    def mark(self, name: str, metrics: dict | None = None):
        self.manifest['stages'][name] = {
            'completed_at': time.strftime('%Y-%m-%dT%H:%M:%S'),
            'metrics': metrics or {},
        }
        self._save()

    def metrics(self, name: str) -> dict:
        return self.manifest['stages'].get(name, {}).get('metrics', {})
