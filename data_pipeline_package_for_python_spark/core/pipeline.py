"""Pipeline: the orchestration context whose slots hold Spark DataFrames.

Clean-room re-expression of the reference's ``DPP`` class
(/root/reference/dpp.py:168-622) with Spark-native semantics:

- Context slots (``Dict[str, Any]``) typically hold ``pyspark.sql.DataFrame``
  objects, but any value is allowed (dpp.py:178 imposes no type constraints).
  Because DataFrames are lazy, every pipeline step is *plan construction*;
  Catalyst optimizes the fused plan when an action finally runs.  The
  reference executes each step eagerly in-process (dpp.py:283-296) — here
  "execution" of a step merely rebinds a slot to a new immutable DataFrame.

- Five combinators with the reference's surface:
  ``common`` (elementwise map, dpp.py:337-376), ``all`` (fan-in,
  dpp.py:378-412), ``branch`` (fan-out, dpp.py:414-464), ``sequence``
  (ordered composition, dpp.py:466-505), ``select`` (conditional routing,
  dpp.py:507-580), plus ``debug`` tracing (dpp.py:582-584).

Documented deviations from the reference (SURVEY §2.1 verified quirks):

1. ``branch(merge='first')`` actually keeps the *first* branch's value.  The
   reference buffers nothing, so its 'first' behaves as 'last'
   (dpp.py:289/329 write before the merge check at dpp.py:453-455).
   Branch outputs here are buffered and merged under the declared policy,
   and every branch reads the pre-branch context snapshot (true fan-out).
2. ``sequence`` accepts explicitly-moded expressions (``fanin(expr)``) so
   an n-in/n-out fan-in step is expressible; 3-tuple steps keep the
   reference's arity heuristic (dpp.py:447-450, 495-498) for compatibility.
3. No ``sys._getframe`` globals injection (dpp.py:198-203) — placeholders
   are reached via ``pipe.x`` / ``pipe["x"]`` only.
4. ``branch`` can auto-persist a slot read by two or more branches
   (``cache_shared=True``): Spark would otherwise recompute the shared
   lineage once per action.  This is the one optimization decision the
   pipeline layer owns (SURVEY §4.2); everything else is Catalyst's job.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterable

from .expressions import (
    ALL,
    PREV,
    CompleteExpression,
    PartialExpression,
    Placeholder,
    PlaceholderList,
    _SuperVar,
)

logger = logging.getLogger("data_pipeline_package_for_python_spark")

_RESERVED = {
    "context",
    "var_names",
    "last_outputs",
    "debug_enabled",
    "_in_context",
}

__all__ = ["Pipeline"]


class _ContextSnapshot:
    """Read-only attribute view of the context for ``select`` conditions.

    Mirrors the reference's snapshot object (dpp.py:528-533): conditions are
    ``Callable[[snapshot], bool]`` and may inspect any slot.  With DataFrame
    slots a condition that looks at *data* (not just schema) forces an eager
    Spark action — that cost is inherent to pipeline-level routing and is
    documented on :meth:`Pipeline.select`.
    """

    def __init__(self, context: dict[str, Any]):
        object.__setattr__(self, "_ctx", dict(context))

    def __getattr__(self, name: str) -> Any:
        try:
            return self._ctx[name]
        except KeyError:
            raise AttributeError(f"no pipeline variable {name!r}") from None

    def __getitem__(self, name: str) -> Any:
        return self._ctx[name]

    def __setattr__(self, name: str, value: Any):
        raise AttributeError("select() condition snapshot is read-only")


class Pipeline:
    """Dataflow-orchestration context over Spark DataFrames.

    >>> with Pipeline(orders=spark.read.parquet(path)) as p:
    ...     p.common(p.orders, lambda df: df.filter("o_totalprice > 0"), p.big)
    >>> p.big.count()
    """

    def __init__(self, **initial_data: Any):
        self.context: dict[str, Any] = dict(initial_data)
        # Frozen at init, matching the reference (dpp.py:177): ALL never
        # expands to variables created mid-pipeline.
        self.var_names: tuple[str, ...] = tuple(initial_data)
        self.last_outputs: list[str] = []
        self.debug_enabled = False
        self._in_context = False
        self._placeholders: dict[str, Placeholder] = {
            name: Placeholder(name) for name in initial_data
        }

    # ------------------------------------------------------------------ #
    # context-manager lifecycle                                          #
    # ------------------------------------------------------------------ #

    def __enter__(self) -> "Pipeline":
        self._in_context = True
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        self._in_context = False

    # ------------------------------------------------------------------ #
    # attribute / item access                                            #
    # ------------------------------------------------------------------ #

    def __getattr__(self, name: str):
        # Only called when normal lookup fails; real attributes are set in
        # __init__ so this handles pipeline variables exclusively.
        if name.startswith("_") or name in _RESERVED:
            raise AttributeError(name)
        if self.__dict__.get("_in_context", False):
            ph = self._placeholders.get(name)
            if ph is None:
                ph = Placeholder(name)
                self._placeholders[name] = ph
            return ph
        if name in self.context:
            return self.context[name]
        raise AttributeError(f"no pipeline variable {name!r}")

    def __getitem__(self, name: str):
        if self._in_context:
            return self.__getattr__(name)
        return self.context[name]

    def value(self, name: str) -> Any:
        """Concrete slot value regardless of context mode."""
        return self.context[name]

    # ------------------------------------------------------------------ #
    # resolution helpers                                                 #
    # ------------------------------------------------------------------ #

    def _as_placeholder_list(self, spec) -> list:
        if isinstance(spec, (Placeholder, _SuperVar)):
            return [spec]
        if isinstance(spec, (PlaceholderList, list, tuple)):
            out = []
            for item in spec:
                if not isinstance(item, (Placeholder, _SuperVar)):
                    raise TypeError(f"expected placeholder, got {item!r}")
                out.append(item)
            return out
        raise TypeError(f"expected placeholder(s), got {spec!r}")

    def _resolve_names(self, placeholders: list, *, as_outputs: bool,
                       resolved_inputs: list[str] | None = None) -> list[str]:
        names: list[str] = []
        for p in placeholders:
            if p is ALL:
                if as_outputs:
                    # output-ALL means "write back to the inputs"
                    # (dpp.py:263-266)
                    if resolved_inputs is None:
                        raise ValueError("ALL as output requires inputs")
                    names.extend(resolved_inputs)
                else:
                    names.extend(self.var_names)
            elif p is PREV:
                if not self.last_outputs:
                    raise ValueError(
                        "PREV used but no previous step has produced outputs"
                    )
                names.extend(self.last_outputs)
            elif isinstance(p, Placeholder):
                names.append(p.name)
            else:
                raise TypeError(f"cannot resolve {p!r}")
        return names

    def _resolve_step(self, expr: CompleteExpression) -> tuple[list[str], Callable, list[str]]:
        in_names = self._resolve_names(expr.inputs, as_outputs=False)
        out_names = self._resolve_names(
            expr.outputs, as_outputs=True, resolved_inputs=in_names
        )
        return in_names, expr.fn, out_names

    def _coerce_step(self, args: tuple, *, what: str) -> CompleteExpression:
        """Accept either one CompleteExpression or (inputs, fn, outputs)."""
        if len(args) == 1:
            step = args[0]
            if isinstance(step, PartialExpression):
                raise ValueError(
                    f"{what}: expression is missing its outputs "
                    "(did you forget '>> V(...)'?)"
                )
            if not isinstance(step, CompleteExpression):
                raise ValueError(
                    f"{what}: single argument must be a complete "
                    f"'inputs >> fn >> outputs' expression, got {step!r}"
                )
            return step
        if len(args) == 3:
            inputs, fn, outputs = args
            if not callable(fn):
                raise TypeError(f"{what}: fn must be callable, got {fn!r}")
            return CompleteExpression(
                self._as_placeholder_list(inputs), fn,
                self._as_placeholder_list(outputs),
            )
        raise ValueError(
            f"{what}: expected 1 expression or 3 args (inputs, fn, outputs), "
            f"got {len(args)} args"
        )

    # ------------------------------------------------------------------ #
    # executors                                                          #
    # ------------------------------------------------------------------ #

    def _read(self, name: str) -> Any:
        try:
            return self.context[name]
        except KeyError:
            raise KeyError(f"pipeline variable {name!r} is not bound") from None

    def _write(self, updates: dict[str, Any]) -> None:
        for name, value in updates.items():
            self.context[name] = value
            self._placeholders.setdefault(name, Placeholder(name))

    def _run_map(self, in_names: list[str], fn: Callable,
                 out_names: list[str]) -> dict[str, Any]:
        if len(in_names) != len(out_names):
            raise ValueError(
                f"map step arity mismatch: {len(in_names)} inputs vs "
                f"{len(out_names)} outputs"
            )
        updates = {
            out: fn(self._read(src)) for src, out in zip(in_names, out_names)
        }
        if self.debug_enabled:
            logger.info("[MAP] %s -> %s", in_names, out_names)
        return updates

    def _run_all(self, in_names: list[str], fn: Callable,
                 out_names: list[str]) -> dict[str, Any]:
        result = fn(*(self._read(n) for n in in_names))
        if len(out_names) == 1:
            updates = {out_names[0]: result}
        else:
            if not isinstance(result, (tuple, list)):
                raise ValueError(
                    f"fan-in step declared {len(out_names)} outputs but fn "
                    f"returned a single {type(result).__name__}"
                )
            if len(result) != len(out_names):
                raise ValueError(
                    f"fan-in step declared {len(out_names)} outputs but fn "
                    f"returned {len(result)}"
                )
            updates = dict(zip(out_names, result))
        if self.debug_enabled:
            logger.info("[ALL] %s -> %s", in_names, out_names)
        return updates

    def _dispatch(self, step: CompleteExpression) -> dict[str, Any]:
        in_names, fn, out_names = self._resolve_step(step)
        mode = step.mode
        if mode == "auto":
            # Reference arity heuristic (dpp.py:447-450): equal arity ⇒ map.
            mode = "map" if len(in_names) == len(out_names) else "all"
        runner = self._run_map if mode == "map" else self._run_all
        return runner(in_names, fn, out_names)

    # ------------------------------------------------------------------ #
    # the five combinators                                               #
    # ------------------------------------------------------------------ #

    def common(self, *args) -> "Pipeline":
        """Elementwise map: ``common((o,p), fn, (x,y))`` ⇒ ``x=fn(o); y=fn(p)``.

        (dpp.py:337-376.)  With DataFrame slots this is the analogue of
        ``df.transform(fn)`` applied independently per named table.
        """
        step = self._coerce_step(args, what="common").with_mode("map")
        updates = self._dispatch(step)
        self._write(updates)
        self.last_outputs = list(updates)
        return self

    def all(self, *args) -> "Pipeline":
        """Fan-in apply: ``all((o,p,q), fn, (x,))`` ⇒ ``x = fn(o, p, q)``.

        (dpp.py:378-412.)  The n-ary DataFrame combinator slot — joins,
        unions, or any ``Callable[[DataFrame, ...], DataFrame | tuple]``.
        """
        step = self._coerce_step(args, what="all").with_mode("all")
        updates = self._dispatch(step)
        self._write(updates)
        self.last_outputs = list(updates)
        return self

    def branch(self, *branches, merge: str = "last",
               cache_shared: bool = False) -> "Pipeline":
        """Fan-out: run independent steps against the pre-branch context.

        (dpp.py:414-464.)  ``merge`` resolves output-name collisions:
        ``'last'`` (later branch wins), ``'first'`` (earlier branch wins —
        *fixed* relative to the reference, whose 'first' behaves as 'last',
        SURVEY §2.1 #3), ``'error'`` (raise).

        Because Spark DataFrames are lazy, declaring N branches costs
        nothing; with ``cache_shared=True`` any slot read by ≥2 branches is
        ``persist()``-ed so subsequent *actions* on different branches do
        not recompute the shared upstream lineage.
        """
        if merge not in ("last", "first", "error"):
            raise ValueError(f"invalid merge policy {merge!r}")
        steps = [self._coerce_step((b,) if not isinstance(b, tuple) else b,
                                   what="branch") for b in branches]

        if cache_shared:
            from collections import Counter
            reads: Counter[str] = Counter()
            for step in steps:
                in_names, _, _ = self._resolve_step(step)
                reads.update(set(in_names))
            for name, n in reads.items():
                df = self.context.get(name)
                if n >= 2 and hasattr(df, "persist"):
                    self.context[name] = df.persist()

        merged: dict[str, Any] = {}
        order: list[str] = []
        for step in steps:
            # every branch sees the same pre-branch context: buffer writes
            updates = self._dispatch(step)
            for name, value in updates.items():
                if name in merged:
                    if merge == "error":
                        raise ValueError(
                            f"branch output collision on {name!r} "
                            "(merge='error')"
                        )
                    if merge == "first":
                        continue
                else:
                    order.append(name)
                merged[name] = value
        if self.debug_enabled:
            logger.info("[BRANCH] %d branches -> %s", len(steps), order)
        self._write(merged)
        self.last_outputs = order
        return self

    def sequence(self, *steps) -> "Pipeline":
        """Ordered composition; ``PREV`` wires step N's outputs into N+1.

        (dpp.py:466-505.)  Catalyst fuses the chained transformations into a
        single optimized plan — a sequence of K projection/filter steps is
        *one* scan at execution time, not K passes.
        """
        for raw in steps:
            step = self._coerce_step(
                (raw,) if not isinstance(raw, tuple) else raw, what="sequence"
            )
            updates = self._dispatch(step)
            self._write(updates)
            self.last_outputs = list(updates)
            if self.debug_enabled:
                logger.info("[SEQUENCE] step -> %s", self.last_outputs)
        return self

    def select(self, *branches, default=None) -> "Pipeline":
        """First-match conditional routing (dpp.py:507-580).

        Each branch is ``(condition, step)`` where ``condition`` is
        ``Callable[[snapshot], bool]`` over a read-only context snapshot.
        First true condition executes its step, then routing stops; if none
        match, ``default`` (a step) runs, else no-op — matching the
        reference's verified silent no-op behavior.

        Cost note (SURVEY §4.2): a condition that inspects DataFrame *data*
        (``df.first()``, ``df.count()``) triggers an eager Spark action at
        routing time.  Schema/metadata conditions (``'x' in df.columns``)
        are free.  Row-level routing should use ``F.when`` instead.
        """
        snapshot = _ContextSnapshot(self.context)
        for b in branches:
            if not (isinstance(b, tuple) and len(b) == 2 and callable(b[0])):
                raise ValueError(
                    "select branches must be (condition, step) pairs"
                )
        for condition, raw in branches:
            if condition(snapshot):
                step = self._coerce_step(
                    (raw,) if not isinstance(raw, tuple) else raw,
                    what="select",
                )
                updates = self._dispatch(step)
                self._write(updates)
                self.last_outputs = list(updates)
                if self.debug_enabled:
                    logger.info("[SELECT] matched -> %s", self.last_outputs)
                return self
        if default is not None:
            step = self._coerce_step(
                (default,) if not isinstance(default, tuple) else default,
                what="select default",
            )
            updates = self._dispatch(step)
            self._write(updates)
            self.last_outputs = list(updates)
            if self.debug_enabled:
                logger.info("[SELECT] default -> %s", self.last_outputs)
        elif self.debug_enabled:
            logger.info("[SELECT] no branch matched (no-op)")
        return self

    def debug(self, enabled: bool = True) -> "Pipeline":
        """Toggle step tracing (dpp.py:582-584); also see ``explain``."""
        self.debug_enabled = enabled
        return self

    # ------------------------------------------------------------------ #
    # Spark-native extras                                                #
    # ------------------------------------------------------------------ #

    def explain(self, name: str, mode: str = "formatted") -> "Pipeline":
        """Print the Catalyst physical plan for a DataFrame slot."""
        df = self._read(name)
        if hasattr(df, "explain"):
            df.explain(mode)
        return self

    def prepare(self, name: str):
        """Prepared-statement handle for a DataFrame slot.

        Pays the Catalyst front-end (construction + analysis) once;
        every ``.dataframe()`` on the returned
        :class:`~data_pipeline_package_for_python_spark.plans.PreparedQuery`
        re-executes honestly (fresh optimizer/AQE run, no stage reuse)
        at ~1–2 ms of setup instead of 50–120 ms.  See
        ``plans/prepared.py`` for the frozen-at-prepare-time semantics.
        """
        from ..plans import prepare as _prepare

        df = self._read(name)
        if not hasattr(df, "sparkSession"):
            raise TypeError(
                f"pipeline variable {name!r} is not a DataFrame"
            )
        return _prepare(df)

    def persist(self, *names: str) -> "Pipeline":
        for name in names:
            df = self._read(name)
            if hasattr(df, "persist"):
                self.context[name] = df.persist()
        return self

    def unpersist(self, *names: str) -> "Pipeline":
        for name in names:
            df = self._read(name)
            if hasattr(df, "unpersist"):
                df.unpersist()
        return self

    def keys(self) -> Iterable[str]:
        return self.context.keys()
