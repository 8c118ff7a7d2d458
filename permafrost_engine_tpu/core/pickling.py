"""Whole-graph object pickler — the py_pickle.c analogue.

The reference ships a 7.8k-line cPickle derivative that can serialize any
Python object graph — classes, modules, closures, lambdas, bound methods,
weakrefs, iterators — so a session save captures the *entire interpreter*
(ref: /root/reference/src/script/py_pickle.c:278-369, used by
src/session.c:176-233). CPython 3's stock pickle refuses most of those
categories; this module extends it with by-value reduction for the script
layer so a session blob alone can rebuild handlers, UI view-controllers,
entity wrappers and live pf.Task fibers in a **fresh process**.

Categories handled beyond stock pickle (python 3.12 already round-trips
iterators — list/tuple/str/set/dict-view/range/zip/map/filter/enumerate —
and operator.itemgetter/attrgetter/methodcaller natively):

* functions by value: lambdas, closures, nested/decorated functions, and
  any function whose defining module is "script territory" (see the
  `by_value` policy) — serialized as marshalled code + referenced-globals
  subset + closure cells, sharing one namespace per source globals dict
* cells as first-class objects: identity and sharing survive (two
  closures over one `nonlocal` slot stay coupled after load); cycles
  (recursive closures) are broken by reducing function-owned cells empty
  and refilling contents from each owning function's state
* classes by value (script-defined classes, dynamic Enums, namedtuples):
  skeleton + populated dict, with a process-level registry so repeated
  loads unify class identity
* dynamic modules by value; already-imported safe modules by reference —
  the loader NEVER imports game-script modules (imports re-run setup)
* bound methods, staticmethod/classmethod, property, mappingproxy
* weakref.ref (re-created against the unpickled referent)
* persistent tokens: engine-side singletons (the Engine, its bus,
  scheduler, …) are swapped for named tokens at save and resolved against
  the freshly restored engine at load

Out of scope (documented, tested as xfail in tests/test_pickle.py):
running generator/coroutine frames (live pf.Task fibers persist via the
scheduler's deterministic-replay log instead — core/sched.py), frame and
traceback objects, OS handles (sockets, files, threads, locks).

Blobs are same-interpreter-version artifacts (code objects go through
`marshal`), exactly like the reference's pickles are CPython-2.7 bound.
"""

from __future__ import annotations

import builtins
import enum
import importlib
import io
import itertools
import marshal
import pickle
import sys
import types
import weakref

PROTOCOL = 5    # 6-tuple reduces (state_setter) need protocol 5

# process-level registries: by-value classes/namespaces/modules unify
# across repeated loads in one process (isinstance stays coherent when a
# session is loaded twice), keyed by a save-time id minted per object
_DYN_NAMESPACES: dict[str, dict] = {}
_DYN_CLASSES: dict[str, type] = {}
_DYN_MODULES: dict[str, types.ModuleType] = {}

_counter = itertools.count()


def _mint(prefix: str) -> str:
    return f"{prefix}:{next(_counter)}"


class _SaveIds:
    """Stable per-object save ids (one key per live object)."""

    def __init__(self):
        self._weak: weakref.WeakValueDictionary = weakref.WeakValueDictionary()
        self._ids: dict[int, str] = {}

    def key(self, obj, prefix: str) -> str:
        k = self._ids.get(id(obj))
        if k is not None and self._weak.get(k) is obj:
            return k
        k = _mint(prefix)
        self._ids[id(obj)] = k
        try:
            self._weak[k] = obj
        except TypeError:
            pass
        return k


_class_ids = _SaveIds()
_module_ids = _SaveIds()


# ---------------------------------------------------------------------------
# reconstruction helpers (referenced by the pickle stream — keep stable)
# ---------------------------------------------------------------------------


def _load_code(data: bytes) -> types.CodeType:
    return marshal.loads(data)


def _make_cell():
    return types.CellType()


def _cell_setstate(cell, st):
    if st:
        cell.cell_contents = st[0]


def _shared_namespace(key: str, module_name: str) -> dict:
    ns = _DYN_NAMESPACES.get(key)
    if ns is None:
        ns = _DYN_NAMESPACES[key] = {
            "__builtins__": builtins,
            "__name__": module_name or "<session>",
        }
    return ns


def _make_skel_function(code, ns_key, module_name, closure):
    glob = _shared_namespace(ns_key, module_name)
    return types.FunctionType(code, glob, code.co_name, None, closure)


_UNSET = object()


def _function_setstate(fn, st):
    fn.__globals__.update(st["globals"])
    for cell, val in zip(fn.__closure__ or (), st["closure"]):
        if val is not _UNSET:
            cell.cell_contents = val
    if st["defaults"] is not None:
        fn.__defaults__ = st["defaults"]
    if st["kwdefaults"] is not None:
        fn.__kwdefaults__ = st["kwdefaults"]
    fn.__qualname__ = st["qualname"]
    fn.__module__ = st["module"]
    fn.__name__ = st["name"]
    fn.__doc__ = st["doc"]
    if st["annotations"]:
        fn.__annotations__ = st["annotations"]
    fn.__dict__.update(st["dict"])


def _make_skel_class(meta, name, bases, extra, key, qualname, module):
    cls = _DYN_CLASSES.get(key)
    if cls is not None:
        return cls
    ns = dict(extra)
    ns["__qualname__"] = qualname
    ns["__module__"] = module
    cls = meta(name, bases, ns)
    _DYN_CLASSES[key] = cls
    return cls


def _class_setstate(cls, st):
    for k, v in st.items():
        try:
            setattr(cls, k, v)
        except (AttributeError, TypeError):
            pass    # read-only machinery regenerated by the skeleton


def _make_enum(key, name, base, members, module, qualname):
    cls = _DYN_CLASSES.get(key)
    if cls is not None:
        return cls
    base = base or enum.Enum
    cls = base(name, members)       # the functional API, on the mixin base
    cls.__module__ = module
    cls.__qualname__ = qualname
    _DYN_CLASSES[key] = cls
    return cls


def _make_namedtuple(key, name, fields, defaults, module, qualname):
    cls = _DYN_CLASSES.get(key)
    if cls is not None:
        return cls
    import collections
    cls = collections.namedtuple(name, fields,
                                 defaults=defaults or None)
    cls.__module__ = module
    cls.__qualname__ = qualname
    _DYN_CLASSES[key] = cls
    return cls


def _make_dyn_module(key: str, name: str):
    mod = _DYN_MODULES.get(key)
    if mod is None:
        mod = _DYN_MODULES[key] = types.ModuleType(name)
    return mod


def _module_setstate(mod, st):
    mod.__dict__.update(st)


def _import_module(name: str) -> types.ModuleType:
    return importlib.import_module(name)


def _make_method(func, inst):
    return types.MethodType(func, inst)


def _make_mappingproxy(d):
    return types.MappingProxyType(d)


def _make_weakref(referent):
    return weakref.ref(referent)


class _Expired:
    pass


def _dead_weakref():
    return weakref.ref(_Expired())


def _restore_device_array(np_value):
    import jax.numpy as jnp
    return jnp.asarray(np_value)


# ---------------------------------------------------------------------------
# the pickler
# ---------------------------------------------------------------------------

# module objects referenced from script state are stored by name only when
# their import is known side-effect-free; everything else ships by value
_SAFE_MODULE_ROOTS = frozenset({
    "builtins", "permafrost_engine_tpu", "numpy", "jax", "jaxlib", "flax",
    "collections", "functools", "operator", "itertools", "types", "enum",
    "dataclasses", "weakref", "math", "random", "re", "os", "sys", "io",
    "pickle", "copy", "abc", "typing", "datetime", "json", "heapq", "time",
    "string", "textwrap", "struct", "_thread", "threading", "reprlib",
    "contextlib", "inspect", "warnings", "traceback", "logging", "array",
    "bisect", "uuid",
})

_HEAPTYPE = 1 << 9      # Py_TPFLAGS_HEAPTYPE: python-defined (vs C) type
_IMMUTABLETYPE = 1 << 8  # Py_TPFLAGS_IMMUTABLE_TYPE: C extension heap types
                         # (PEP 384/630) set HEAPTYPE too — only a mutable
                         # heap type is a genuine python-defined class


def _lookup(module: str, qualname: str):
    """Resolve module.qualname WITHOUT importing (imports may run script
    side effects in a fresh process — the loader must never trigger them
    implicitly, so neither should the save-side importability probe)."""
    mod = sys.modules.get(module)
    if mod is None:
        return None
    obj = mod
    for part in qualname.split("."):
        obj = getattr(obj, part, None)
        if obj is None:
            return None
    return obj


def _referenced_names(code: types.CodeType, out: set | None = None) -> set:
    out = set() if out is None else out
    out.update(code.co_names)
    for c in code.co_consts:
        if isinstance(c, types.CodeType):
            _referenced_names(c, out)
    return out


class GraphPickler(pickle.Pickler):
    """Pickler with by-value reduction for the script layer.

    `tokens` maps id(obj) -> token string for engine-side singletons; the
    matching GraphUnpickler resolves tokens against the restored engine.
    `by_value(module_name)` forces functions/classes/modules of that
    module to serialize by value even when importable — game-script
    modules must never be re-imported (and re-executed) by a load.
    """

    def __init__(self, file, protocol: int = PROTOCOL, *,
                 tokens: dict[int, str] | None = None,
                 by_value=None):
        super().__init__(file, protocol)
        self._tokens = tokens or {}
        self._by_value = by_value or (lambda mod: False)
        self._fn_cells: set[int] = set()   # cells owned by pickled functions
        # globals-dict -> namespace key, PER DUMP: a module-level id() map
        # would go stale when globals dicts are collected and their ids
        # reused (observed under pytest); within one dump the pickled
        # functions keep their globals alive, so id() is safe here
        self._ns_ids: dict[int, str] = {}

    # -- persistent tokens ----------------------------------------------------

    def persistent_id(self, obj):
        return self._tokens.get(id(obj))

    # -- by-value policy --------------------------------------------------------

    def _value_bound(self, obj) -> bool:
        """True when obj must serialize by value: unimportable (lambda,
        closure, __main__/exec-defined) or script territory."""
        module = getattr(obj, "__module__", None)
        if module is None:
            return True
        if self._by_value(module):
            return True
        return _lookup(module, getattr(obj, "__qualname__", "")) is not obj

    # -- reducers ----------------------------------------------------------------

    def reducer_override(self, obj):  # noqa: C901 — one dispatch table
        t = type(obj)
        if t is types.FunctionType:
            if not self._value_bound(obj):
                return NotImplemented
            return self._reduce_function(obj)
        if isinstance(obj, type):
            if (not (obj.__flags__ & _HEAPTYPE)
                    or (obj.__flags__ & _IMMUTABLETYPE)):
                return NotImplemented   # C types always by reference
            if not self._value_bound(obj):
                return NotImplemented
            if issubclass(obj, enum.Enum):
                return self._reduce_enum(obj)
            if issubclass(obj, tuple) and hasattr(obj, "_fields"):
                return self._reduce_namedtuple(obj)
            return self._reduce_class(obj)
        if t is types.CellType:
            if id(obj) in self._fn_cells:
                # contents arrive via the owning function's state —
                # keeps cell identity shared AND breaks closure cycles
                return (_make_cell, (), (), None, None, _cell_setstate)
            try:
                st = (obj.cell_contents,)
            except ValueError:
                st = ()
            return (_make_cell, (), st, None, None, _cell_setstate)
        if t is types.CodeType:
            return (_load_code, (marshal.dumps(obj),))
        if t is types.MethodType:
            return (_make_method, (obj.__func__, obj.__self__))
        if t is staticmethod or t is classmethod:
            return (t, (obj.__func__,))
        if t is property:
            return (property, (obj.fget, obj.fset, obj.fdel, obj.__doc__))
        if t is types.MappingProxyType:
            return (_make_mappingproxy, (dict(obj),))
        if t is types.ModuleType:
            return self._reduce_module(obj)
        if t is weakref.ref:
            referent = obj()
            if referent is None:
                return (_dead_weakref, ())
            return (_make_weakref, (referent,))
        if t is types.GeneratorType or t is types.CoroutineType:
            raise pickle.PicklingError(
                f"cannot pickle live {t.__name__} {obj!r}: running frames "
                "are interpreter-internal. Long-lived script logic belongs "
                "in pf.Task fibers, which persist mid-execution through "
                "the scheduler's deterministic-replay log (core/sched.py).")
        if t is types.FrameType or t is types.TracebackType:
            raise pickle.PicklingError(
                f"cannot pickle {t.__name__} objects (interpreter-internal)")
        if _jax_array_type is not None and isinstance(obj, _jax_array_type):
            import numpy as np
            return (_restore_device_array, (np.asarray(obj),))
        return NotImplemented

    def _reduce_function(self, fn):
        code = fn.__code__
        glob = fn.__globals__
        ns_key = self._ns_ids.get(id(glob))
        if ns_key is None:
            ns_key = self._ns_ids[id(glob)] = _mint("ns")
        module = getattr(fn, "__module__", None) or "<session>"
        cells = fn.__closure__
        closure_vals = []
        for c in cells or ():
            self._fn_cells.add(id(c))
            try:
                closure_vals.append(c.cell_contents)
            except ValueError:
                closure_vals.append(_UNSET)
        subset = {}
        for name in _referenced_names(code):
            if name in glob:
                subset[name] = glob[name]
        state = {
            "globals": subset,
            "closure": closure_vals,
            "defaults": fn.__defaults__,
            "kwdefaults": fn.__kwdefaults__,
            "qualname": fn.__qualname__,
            "module": module,
            "name": fn.__name__,
            "doc": fn.__doc__,
            "annotations": dict(getattr(fn, "__annotations__", {})),
            "dict": dict(fn.__dict__),
        }
        args = (code, ns_key, module, cells)
        return (_make_skel_function, args, state, None, None,
                _function_setstate)

    def _reduce_class(self, cls):
        key = _class_ids.key(cls, "cls")
        extra = {}
        slots = cls.__dict__.get("__slots__")
        if slots is not None:
            extra["__slots__"] = slots
        state = {}
        for k, v in cls.__dict__.items():
            if k in ("__dict__", "__weakref__", "__slots__", "_abc_impl"):
                continue    # abc machinery is regenerated by ABCMeta
            if isinstance(v, (types.MemberDescriptorType,
                              types.GetSetDescriptorType)):
                continue    # regenerated by the skeleton's __slots__
            state[k] = v
        args = (type(cls), cls.__name__, cls.__bases__, extra, key,
                cls.__qualname__, cls.__module__)
        return (_make_skel_class, args, state, None, None, _class_setstate)

    def _reduce_enum(self, cls):
        key = _class_ids.key(cls, "enum")
        members = [(m.name, m.value) for m in cls]
        base = None
        for b in cls.__mro__[1:]:
            if issubclass(b, enum.Enum) and not self._value_bound(b):
                base = b
                break
        skip = set(cls._member_names_) | {
            "__module__", "__qualname__", "__doc__", "_member_names_",
            "_member_map_", "_value2member_map_", "__new__",
            "_unhashable_values_", "_member_type_", "_value_repr_",
            "_new_member_", "_use_args_", "__signature__",
        }
        extra = {k: v for k, v in cls.__dict__.items() if k not in skip}
        return (_make_enum,
                (key, cls.__name__, base, members, cls.__module__,
                 cls.__qualname__),
                extra, None, None, _class_setstate)

    def _reduce_namedtuple(self, cls):
        key = _class_ids.key(cls, "nt")
        defaults = list(getattr(cls, "_field_defaults", {}).values())
        import collections
        probe = collections.namedtuple("_Probe", cls._fields)
        extra = {}
        for k, v in cls.__dict__.items():
            if k in probe.__dict__ or k in ("__dict__", "__weakref__",
                                            "__slots__"):
                continue
            extra[k] = v
        return (_make_namedtuple,
                (key, cls.__name__, list(cls._fields), defaults,
                 cls.__module__, cls.__qualname__),
                extra, None, None, _class_setstate)

    def _reduce_module(self, mod):
        name = mod.__name__
        if (not self._by_value(name) and sys.modules.get(name) is mod
                and name.partition(".")[0] in _SAFE_MODULE_ROOTS):
            return (_import_module, (name,))
        key = _module_ids.key(mod, "mod")
        state = {k: v for k, v in mod.__dict__.items()
                 if k not in ("__builtins__", "__loader__", "__spec__")}
        return (_make_dyn_module, (key, name), state, None, None,
                _module_setstate)


try:
    import jax as _jax
    _jax_array_type = _jax.Array
except Exception:       # pragma: no cover — jax is baked into this image
    _jax_array_type = None


class GraphUnpickler(pickle.Unpickler):
    def __init__(self, file, *, resolve: dict[str, object] | None = None):
        super().__init__(file)
        self._resolve = resolve or {}

    def persistent_load(self, pid):
        try:
            return self._resolve[pid]
        except KeyError:
            raise pickle.UnpicklingError(
                f"session blob references engine token {pid!r} but the "
                f"loader provided no binding for it") from None


# ---------------------------------------------------------------------------
# convenience API
# ---------------------------------------------------------------------------


def dumps(obj, *, tokens: dict[int, str] | None = None,
          by_value=None) -> bytes:
    buf = io.BytesIO()
    GraphPickler(buf, tokens=tokens, by_value=by_value).dump(obj)
    return buf.getvalue()


def loads(data: bytes, *, resolve: dict[str, object] | None = None):
    return GraphUnpickler(io.BytesIO(data), resolve=resolve).load()


def picklable(obj, *, tokens: dict[int, str] | None = None,
              by_value=None) -> bool:
    try:
        dumps(obj, tokens=tokens, by_value=by_value)
        return True
    except Exception:
        return False
