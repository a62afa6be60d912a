"""Minimal stand-in for the `pyrsistent` API surface pypond imports
(pmap/PMap, pvector/PVector, freeze, thaw), so the reference library
can run in this zero-egress container and be timed as a baseline.

Functional semantics match pyrsistent (every mutator returns a new
object); the backing store is a plain dict/tuple copy instead of a
HAMT. For pypond's per-event maps (a handful of keys) a full copy is
the same order of work as pyrsistent's node path copy, so timings are
representative of the real dependency.
"""


class PMap(dict):
    """Immutable-by-convention dict: mutators return new PMaps."""

    def set(self, key, value):
        new = PMap(self)
        dict.__setitem__(new, key, value)
        return new

    def update(self, *maps, **kwargs):  # pyrsistent returns the merge
        new = PMap(self)
        for other in maps:
            dict.update(new, other)
        dict.update(new, kwargs)
        return new

    def remove(self, key):
        new = PMap(self)
        dict.__delitem__(new, key)
        return new

    def discard(self, key):
        new = PMap(self)
        dict.pop(new, key, None)
        return new


class PVector(tuple):
    """Immutable sequence: mutators return new PVectors."""

    def set(self, index, value):
        return PVector(self[:index] + (value,) + self[index + 1:])

    def append(self, value):
        return PVector(self + (value,))

    def extend(self, values):
        return PVector(self + tuple(values))


def pmap(initial=None):
    return PMap(initial or {})


def pvector(initial=None):
    return PVector(initial or ())


def freeze(obj):
    if isinstance(obj, dict):
        return PMap({k: freeze(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return PVector(freeze(v) for v in obj)
    return obj


def thaw(obj):
    if isinstance(obj, dict):
        return {k: thaw(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [thaw(v) for v in obj]
    return obj
