"""Bounded insertion for module-level compiled-driver caches.

Compiled closures embed per-plan device constants (band tables,
ladders, prefactors), so unbounded caches leak HBM across re-plans
(new pointing / time chunk). Callers hold strong references to the
entries they are actively using; eviction only drops standby
compilations.
"""


def lru_insert(cache: dict, key, value, max_entries: int = 8):
    """Insert ``value`` and evict the oldest entries beyond the cap
    (dicts preserve insertion order, so the first key is the oldest)."""
    cache.pop(key, None)
    cache[key] = value
    while len(cache) > max_entries:
        cache.pop(next(iter(cache)))
    return value
