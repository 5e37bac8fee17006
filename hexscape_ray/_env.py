"""Worker-import robustness.

Ray local-mode workers resolve ``hexscape_ray`` through the driver's
working directory at ``ray.init`` time; when the hosting process (the
grading driver, a notebook, cron) initialises Ray from some other cwd,
every worker raises ``ModuleNotFoundError`` — which Ray Data retries
silently, so pipelines HANG instead of failing.

Fix: when (and only when) the current process context would break
worker imports — cwd is not the repo root and PYTHONPATH does not
contain it — inject a per-stage ``runtime_env`` carrying PYTHONPATH
into every ``Dataset.map_batches`` call.  In the normal case this is a
no-op, so no dedicated worker pools are created.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_installed = False


def maybe_runtime_env() -> dict | None:
    if os.getcwd() == REPO_ROOT:
        return None
    pp = os.environ.get("PYTHONPATH", "")
    if REPO_ROOT in pp.split(os.pathsep):
        return None
    joined = REPO_ROOT + (os.pathsep + pp if pp else "")
    return {"env_vars": {"PYTHONPATH": joined}}


def install_import_guard() -> None:
    """Idempotently wrap Dataset.map_batches with the runtime-env
    injection (callers may still pass their own ``runtime_env``)."""
    global _installed
    if _installed:
        return
    try:
        import ray.data
    except ImportError:  # pragma: no cover
        return

    orig = ray.data.Dataset.map_batches

    def map_batches(self, fn, **kwargs):
        if "runtime_env" not in kwargs:
            renv = maybe_runtime_env()
            if renv is not None:
                kwargs["runtime_env"] = renv
        return orig(self, fn, **kwargs)

    map_batches.__wrapped__ = orig
    ray.data.Dataset.map_batches = map_batches

    # GroupedData.map_groups builds its map operator WITHOUT going
    # through Dataset.map_batches — wrap it too (same **ray_remote_args
    # pass-through accepts runtime_env)
    from ray.data.grouped_data import GroupedData

    orig_groups = GroupedData.map_groups

    def map_groups(self, fn, **kwargs):
        if "runtime_env" not in kwargs:
            renv = maybe_runtime_env()
            if renv is not None:
                kwargs["runtime_env"] = renv
        return orig_groups(self, fn, **kwargs)

    map_groups.__wrapped__ = orig_groups
    GroupedData.map_groups = map_groups
    _installed = True
