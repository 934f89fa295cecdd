"""Per-worker cache for ``ray.put`` broadcast objects.

A bare ``ray.get(ref)`` inside a ``map_batches`` UDF re-deserializes
the object on EVERY call; caching by the ref's hex id makes the
unpickle happen once per worker process. Module-global so every stage
shares one cache regardless of how its UDF closure is shipped
(previously three closure-local copies of this pattern had drifted —
review finding r2)."""

from __future__ import annotations

_CACHE: dict = {}


def cached_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        import ray

        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
