"""External-method plugin discovery.

Reference: ``nerfstudio/plugins/registry.py:51`` (``discover_methods``
over the ``nerfstudio.method_configs`` entry point, used at
``samnerf/samconfigs.py:169-171``).  Same mechanism, our entry-point
group name.
"""
from __future__ import annotations

from importlib.metadata import entry_points
from typing import Dict


ENTRY_POINT_GROUP = "samnerf_tpu.method_configs"


def discover_methods() -> Dict[str, object]:
    """Load third-party method presets registered via entry points.

    Each entry point must resolve to a zero-arg callable returning a
    MethodConfig (or a MethodConfig instance)."""
    methods: Dict[str, object] = {}
    try:
        eps = entry_points(group=ENTRY_POINT_GROUP)
    except TypeError:  # < py3.10 signature
        eps = entry_points().get(ENTRY_POINT_GROUP, [])
    for ep in eps:
        obj = ep.load()
        methods[ep.name] = obj() if callable(obj) else obj
    return methods
