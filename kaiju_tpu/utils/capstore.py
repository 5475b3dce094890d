"""Persisted sticky funnel capacities.

Every fused device program bakes its lane capacities (M2, Ms, Mn, Mv,
Mt, ...) into the compiled executable; an overflow grows the capacity
and recompiles.  Growth is learned per database + batch shape, so we
persist it next to the index: a fresh process starts at the learned
steady-state sizes, compiles ONCE (usually straight from the
persistent XLA compile cache), and never pays a mid-stream recompile.

The reference has no analog (its per-read heap has no capacity
concept); this is the TPU-side cost of static shapes.
"""

from __future__ import annotations

import json
import os
from typing import Optional


class CapStore:
    """Caps are keyed by a config signature: runs with different search
    knobs (mismatches, min_score, batch shape, ...) have different
    steady-state needs, and one outlier configuration must not inflate
    the padded shapes of every later run against the same DB.  Set
    KAIJU_TPU_RESET_CAPS=1 to discard learned caps for this signature.
    """

    def __init__(self, cache_dir: Optional[str], name: str,
                 sig: Optional[str] = None):
        suffix = f"_{sig}" if sig else ""
        self.path = (
            os.path.join(cache_dir, f"caps_{name}{suffix}.json")
            if cache_dir
            else None
        )
        self._data: dict = {}
        if os.environ.get("KAIJU_TPU_RESET_CAPS"):
            return
        load_path = self.path
        if (
            load_path
            and not os.path.exists(load_path)
            and sig
            and cache_dir
        ):
            # seed a fresh signature-keyed store from the legacy flat
            # file (pre-signature caps) so existing DBs keep their
            # learned steady state instead of recompiling from scratch
            legacy = os.path.join(cache_dir, f"caps_{name}.json")
            if os.path.exists(legacy):
                load_path = legacy
        if load_path and os.path.exists(load_path):
            try:
                with open(load_path) as fh:
                    self._data = json.load(fh)
            except (OSError, ValueError):
                self._data = {}

    def get(self, key: str, default: int) -> int:
        v = self._data.get(key)
        return max(int(v), default) if isinstance(v, (int, float)) else default

    def get_map(self, key: str) -> dict[int, int]:
        m = self._data.get(key)
        if not isinstance(m, dict):
            return {}
        return {int(k): int(v) for k, v in m.items()}

    @staticmethod
    def seeded(m: dict[int, int], P: int, floor: int, default: int,
               cap: Optional[int] = None) -> int:
        """Capacity for shape bucket P from the learned map `m`:
        an exact entry wins; otherwise the nearest learned bucket's
        value scales proportionally with P (capacities track the flat
        batch size — an 8x batch needs ~8x lanes, and starting there
        avoids the overflow-retry recompile a cold bucket would pay).
        Seeds m[P] so the caller's retry loop can grow it."""
        if P in m:
            return m[P]
        if m:
            import math

            P0 = min(m, key=lambda q: abs(math.log(P / q)))
            v = max(floor, (m[P0] * P + P0 - 1) // P0)
            b = floor
            while b < v:
                b *= 2
            v = b
        else:
            v = default
        if cap is not None:
            v = min(v, cap)
        m[P] = v
        return v

    def update(self, **kv) -> None:
        changed = False
        for k, v in kv.items():
            if isinstance(v, dict):
                cur = self._data.get(k)
                if not isinstance(cur, dict):  # legacy scalar entry
                    cur = self._data[k] = {}
                for p, c in v.items():
                    new = max(int(cur.get(str(p), 0)), int(c))
                    if cur.get(str(p)) != new:
                        cur[str(p)] = new
                        changed = True
            else:
                new = max(int(self._data.get(k, 0)), int(v))
                if self._data.get(k) != new:
                    self._data[k] = new
                    changed = True
        if changed and self.path:
            try:
                tmp = self.path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(self._data, fh)
                os.replace(tmp, self.path)
            except OSError:
                pass
