"""Tiered intermediate-result cache (SURVEY §2.12 K1-K5).

The reference's KV store (`kv_store/kv_loading_interface.py`) keeps per-
chunk tensors in gpu/cpu/cpu_pin/nfs tiers keyed by `sha256(text+layer)`,
with a bandwidth cost model (`estimated_time`: size/100 gpu, /10 cpu, /1
nfs, `:28-53`) and a placement policy (`decide_tier_to_add`, `:86-102`).

The Spark-native analog caches *DataFrames* (chunk-level intermediates)
under content-derived keys:

- tiers map to StorageLevels — the executor block manager is the engine's
  "gpu/cpu" (deserialized/serialized memory), local disk is "cpu_pin",
  and a reliable checkpoint directory is "nfs" (survives executor loss);
- entry size comes from Catalyst plan statistics, so the placement policy
  is data-size-driven like the reference's free-memory checks;
- `fetch` returns the cached lineage — downstream filters/projections
  still prune columns and skip partitions of the cached data.

Scale: persist() shards blocks across the cluster's block managers;
nothing here funnels through the driver. The cost model's bandwidth
ratios (memory 100 : disk 10 : remote 1) mirror the reference's
constants, used only to *choose* a tier, never to schedule work.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# tier name → (StorageLevel, relative bandwidth) — K3's 100/10/1 constants
# (kv_store/kv_loading_interface.py:28-43: gpu size/100, cpu size/10, nfs /1)
TIERS: dict[str, tuple[StorageLevel, float]] = {
    "memory": (StorageLevel.MEMORY_ONLY, 100.0),
    "memory_ser": (StorageLevel.MEMORY_ONLY_SER if hasattr(StorageLevel, "MEMORY_ONLY_SER") else StorageLevel.MEMORY_ONLY, 50.0),
    "memory_disk": (StorageLevel.MEMORY_AND_DISK, 30.0),
    "disk": (StorageLevel.DISK_ONLY, 10.0),
}


def cache_key(text: str, layer: int | str = "") -> str:
    """K5: sha256 hex over (text, layer)
    (kv_loading_interface.py:19-23,128-135).

    Deliberate deviation from the reference's bare ``text + str(layer)``
    concatenation: that scheme collides distinct pairs — ('chunk1', 2)
    and ('chunk', 12) both hash 'chunk12' — and a collision here serves
    the WRONG cached DataFrame silently. A length prefix makes the
    encoding injective. The reference-parity hash itself stays on the
    F10 query surface (q_hash_key mirrors the raw concat)."""
    payload = f"{len(text)}\x1f{text}\x1f{layer}"
    return hashlib.sha256(payload.encode("utf-8")).hexdigest()


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst-estimated size of the DataFrame's optimized plan."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 0


@dataclass
class CacheEntry:
    df: DataFrame
    tier: str
    size_gb: float


@dataclass
class CacheManager:
    """K1-K4: keyed DataFrame cache with size-aware tier placement.

    >>> mgr = CacheManager()
    >>> key = cache_key(chunk_text, layer)
    >>> mgr.add(key, chunk_df)           # K1 — persists at the chosen tier
    >>> hit = mgr.fetch(key)             # K2 — None on miss
    >>> mgr.estimated_load_time(key)     # K3 — size/bandwidth cost model
    """

    memory_budget_gb: float = 4.0
    entries: dict[str, CacheEntry] = field(default_factory=dict)
    _memory_used_gb: float = field(default=0.0, init=False)

    def decide_tier(self, size_gb: float) -> str:
        """K4: placement policy — memory while it fits the budget, then
        memory+disk for mid-size, disk-only for huge intermediates."""
        if self._memory_used_gb + size_gb <= self.memory_budget_gb:
            return "memory"
        if size_gb <= self.memory_budget_gb:
            return "memory_disk"
        return "disk"

    def add(self, key: str, df: DataFrame, tier: str | None = None) -> CacheEntry:
        """K1: persist `df` under `key` at `tier` (auto-chosen if None)."""
        if key in self.entries:
            return self.entries[key]
        size_gb = plan_size_bytes(df) / (1 << 30)
        tier = tier or self.decide_tier(size_gb)
        level, _ = TIERS[tier]
        df.persist(level)
        if tier == "memory":
            self._memory_used_gb += size_gb
        entry = CacheEntry(df=df, tier=tier, size_gb=size_gb)
        self.entries[key] = entry
        return entry

    def fetch(self, key: str) -> DataFrame | None:
        """K2: probe; returns the cached DataFrame lineage or None."""
        e = self.entries.get(key)
        return e.df if e else None

    def estimated_load_time(self, key: str) -> float | None:
        """K3: size_gb / tier_bandwidth (first-hit scan like the reference's
        get_predicted_loading_time)."""
        e = self.entries.get(key)
        if e is None:
            return None
        _, bw = TIERS[e.tier]
        return e.size_gb / bw

    def evict(self, key: str) -> None:
        e = self.entries.pop(key, None)
        if e is not None:
            if e.tier == "memory":
                self._memory_used_gb = max(0.0, self._memory_used_gb - e.size_gb)
            e.df.unpersist()

    def clear(self) -> None:
        for key in list(self.entries):
            self.evict(key)
