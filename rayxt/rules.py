"""Rule engine core: Transformation / Rule / Ref / flow control / traversal.

Reproduces the reference execution semantics (SURVEY.md section 2.1,
rows C1-C13, reconstructed from funkyfuture/inxs):

* a :class:`Transformation` is an ordered program of steps over ONE
  document; steps are :class:`Rule` objects (traverse + match + handler
  chain) or bare handlers ("simple steps", run once per document);
* handlers are plain callables whose parameters are dependency-injected
  BY NAME from the run's symbol table (``element``, ``context``,
  ``previous_result``, ``root``, ``tree``, ``config``,
  ``transformation``, ``nsmap``);
* each handler's return value becomes ``previous_result``;
* :class:`AbortRule` / :class:`AbortTransformation` implement early
  exit at rule / program level;
* ``config.result_object`` is a dotted path into the run namespace
  (default ``'context'`` -> the root, see ``_resolve_result``).

Differences from the reference that are deliberate (and safe because
semantics are defined per single-threaded run): run state lives in a
per-call :class:`_Run` object, never on the Transformation instance, so
one compiled Transformation is reusable concurrently across actor
threads / rows (SURVEY C2 notes the reference is NOT thread-safe).

Signature inspection happens once per callable (cached), so the
per-element cost is plain dict lookups — this is the "compiled
transformation table" the north star asks for (BASELINE.json:6).
"""

from __future__ import annotations

import copy as _copy
import inspect
from types import SimpleNamespace

from .dom import Node
from .matchers import compile_conditions

__all__ = [
    "Ref",
    "AbortRule",
    "AbortTransformation",
    "Rule",
    "Transformation",
    "TRAVERSE_DEPTH_FIRST",
    "TRAVERSE_LEFT_TO_RIGHT",
    "TRAVERSE_RIGHT_TO_LEFT",
    "TRAVERSE_TOP_TO_BOTTOM",
    "TRAVERSE_BOTTOM_TO_TOP",
    "TRAVERSE_ROOT_ONLY",
]

TRAVERSE_DEPTH_FIRST = 1
TRAVERSE_LEFT_TO_RIGHT = 2
TRAVERSE_RIGHT_TO_LEFT = 4
TRAVERSE_TOP_TO_BOTTOM = 8
TRAVERSE_BOTTOM_TO_TOP = 16
TRAVERSE_ROOT_ONLY = 32

_DEFAULT_TRAVERSAL = (
    TRAVERSE_DEPTH_FIRST | TRAVERSE_LEFT_TO_RIGHT | TRAVERSE_TOP_TO_BOTTOM
)


class AbortRule(Exception):
    """Stop applying the current rule; continue with the next step (C8)."""


class AbortTransformation(Exception):
    """Stop the whole program; return the result object as-is (C9)."""


class Ref:
    """Late-bound dotted lookup into the run namespace (C7).

    ``Ref('previous_result')``, ``Ref('context.records')`` etc.; resolved
    at handler-execution time against the live run state.
    """

    __slots__ = ("path", "_parts")

    def __init__(self, path: str):
        self.path = path
        self._parts = tuple(path.split("."))

    def resolve(self, run: "_Run"):
        parts = self._parts
        head = parts[0]
        if hasattr(run, head):
            obj = getattr(run, head)
            rest = parts[1:]
        else:
            obj = run.context
            rest = parts
        for p in rest:
            if isinstance(obj, dict):
                obj = obj[p]
            else:
                obj = getattr(obj, p)
        return obj

    def __repr__(self):
        return f"Ref({self.path!r})"


def resolve(value, run):
    """Resolve Refs (including inside lists/tuples) against the run."""
    if isinstance(value, Ref):
        return value.resolve(run)
    if isinstance(value, (list, tuple)):
        return type(value)(resolve(v, run) for v in value)
    return value


class _Run:
    """Per-call run state: the injectable symbol table."""

    __slots__ = (
        "transformation",
        "config",
        "context",
        "previous_result",
        "root",
        "tree",
        "nsmap",
        "element",
        "rule_hits",
    )

    def __init__(self, transformation, config, context, root, nsmap):
        self.transformation = transformation
        self.config = config
        self.context = context
        self.previous_result = None
        self.root = root
        self.tree = root
        self.nsmap = nsmap or {}
        self.element = None
        self.rule_hits = {}

    def symbols(self) -> dict:
        return {
            "transformation": self.transformation,
            "config": self.config,
            "context": self.context,
            "previous_result": self.previous_result,
            "root": self.root,
            "tree": self.tree,
            "nsmap": self.nsmap,
            "element": self.element,
        }


_SIG_CACHE: dict = {}


def _param_names(fn):
    try:
        key = fn
        cached = _SIG_CACHE.get(key)
    except TypeError:
        key = None
        cached = None
    if cached is None:
        try:
            sig = inspect.signature(fn)
        except (TypeError, ValueError):
            cached = ((), frozenset())
        else:
            required, optional = [], []
            for name, p in sig.parameters.items():
                if p.kind in (p.VAR_POSITIONAL, p.VAR_KEYWORD):
                    continue
                (optional if p.default is not p.empty else required).append(name)
            cached = (tuple(required) + tuple(optional), frozenset(optional))
        if key is not None:
            _SIG_CACHE[key] = cached
    return cached


_RUN_SYMBOLS = frozenset(
    ("transformation", "config", "context", "previous_result", "root",
     "tree", "nsmap", "element")
)


def _invoke(fn, run: "_Run", element=None):
    """Dependency-inject a handler/predicate call by parameter name (C6).

    Symbol resolution reads ``run`` attributes directly (the hot path
    runs once per matched element; building the symbols dict per call
    measured ~15% of handler-dispatch time)."""
    names, optional = _param_names(fn)
    if not names:
        return fn()
    if element is not None:
        run.element = element
    kwargs = {}
    ctx = run.context
    for name in names:
        if name in _RUN_SYMBOLS:
            kwargs[name] = getattr(run, name)
        elif hasattr(ctx, name):
            kwargs[name] = getattr(ctx, name)
        elif name not in optional:
            raise NameError(
                f"handler {getattr(fn, '__name__', fn)!r} wants unknown symbol {name!r}"
            )
    return fn(**kwargs)


def _iter_traversal(root: Node, order: int):
    """Yield live elements per the requested traversal order (C10).

    Implemented combinations (others raise ``NotImplementedError`` like
    the reference): default pre-order (DF+L2R+T2B), its right-to-left
    mirror, bottom-to-top post-order, and root-only.  Nodes detached by
    earlier handlers in the same pass are skipped (their subtrees are
    not descended into).
    """
    if order & TRAVERSE_ROOT_ONLY:
        yield root
        return
    rtl = bool(order & TRAVERSE_RIGHT_TO_LEFT)
    bottom_up = bool(order & TRAVERSE_BOTTOM_TO_TOP)
    if not (order & TRAVERSE_DEPTH_FIRST):
        raise NotImplementedError(f"unsupported traversal order {order}")

    def children_of(n):
        # `tag[:1] != "#"` inlines Node.is_element (per-child method
        # dispatch measured in the kernel profile)
        kids = [c for c in n.children if c.tag[:1] != "#"]
        return list(reversed(kids)) if rtl else kids

    if not bottom_up:
        # pre-order over the live tree; children are re-read AFTER each
        # yield (handlers may mutate the subtree).  Index-based frames
        # instead of iterator objects: this loop runs once per element
        # per fused pass and iterator dispatch measured ~5% of rule time.
        frames = [[[root], 0]]
        while frames:
            top = frames[-1]
            lst, i = top
            if i >= len(lst):
                frames.pop()
                continue
            top[1] = i + 1
            node = lst[i]
            if node.detached:
                continue
            yield node
            if not node.detached:
                if rtl:
                    kids = children_of(node)
                else:
                    kids = [c for c in node.children if c.tag[:1] != "#"]
                if kids:
                    frames.append([kids, 0])
    else:
        def post(n):
            for c in children_of(n):
                if not c.detached:
                    yield from post(c)
            if not n.detached:
                yield n

        yield from post(root)


class Rule:
    """Element-wise step: traversal + AND-ed conditions + handler chain (C3)."""

    def __init__(self, conditions, handlers, name=None, traversal_order=None):
        self.conditions = conditions
        self.handlers = handlers if isinstance(handlers, (list, tuple)) else (handlers,)
        self.name = name
        self.traversal_order = traversal_order
        self._matchers = compile_conditions(conditions)

    def __repr__(self):
        return f"Rule(name={self.name!r}, conditions={self.conditions!r})"


class _CompiledRule:
    __slots__ = ("rule", "matchers", "handlers", "traversal", "label", "chain")

    def __init__(self, rule: Rule, extra_matchers, default_traversal, index):
        self.rule = rule
        self.matchers = list(extra_matchers) + list(rule._matchers)
        self.handlers = rule.handlers
        self.traversal = (
            rule.traversal_order
            if rule.traversal_order is not None
            else default_traversal
        )
        self.label = rule.name or f"rule_{index}"
        self.chain = _compile_handler_chain(rule.handlers)


class _CompiledSimpleStep:
    __slots__ = ("handlers", "label", "chain")

    def __init__(self, handlers, index):
        self.handlers = handlers if isinstance(handlers, (list, tuple)) else (handlers,)
        self.label = f"step_{index}"
        self.chain = _compile_handler_chain(self.handlers)


def _compile_handler_chain(handlers):
    """Bind a handler sequence into one ``chain(run)`` closure.

    Each handler's return value becomes ``run.previous_result`` (C5).
    Handlers carrying a ``_fast_run`` attribute (the hot library
    factories in :mod:`rayxt.lib`) are invoked directly with the run,
    skipping per-call signature lookup and kwargs assembly; everything
    else goes through :func:`_invoke` dependency injection (C6).
    """
    if callable(handlers) and not isinstance(handlers, (list, tuple)):
        handlers = (handlers,)
    fns = []
    for h in handlers:
        fast = getattr(h, "_fast_run", None)
        if fast is not None:
            fns.append(fast)
        else:
            def _call(run, _h=h):
                return _invoke(_h, run)
            fns.append(_call)
    if len(fns) == 1:
        f0 = fns[0]

        def chain(run):
            run.previous_result = f0(run)
        return chain
    fns = tuple(fns)

    def chain(run):
        for f in fns:
            run.previous_result = f(run)
    return chain


def _split_tag_domain(matchers):
    """Fold a rule's LEADING pure-tag matchers into a dispatch domain.

    Returns ``(domain, residual)``: ``domain`` is the frozenset of tags
    the leading tag-only matchers jointly accept (None when the first
    matcher is not tag-only — order must be preserved because condition
    evaluation short-circuits left to right and user predicates may
    observe their own calls), ``residual`` is every remaining matcher in
    original order.
    """
    domain = None
    residual = []
    for i, m in enumerate(matchers):
        tags = m.tag_domain()
        if tags is None:
            residual = list(matchers[i:])
            break
        domain = tags if domain is None else (domain & tags)
    return domain, residual


class _AllRulesAborted(Exception):
    """Internal: every rule in a group hit AbortRule — stop traversing."""


class _RuleGroup:
    """One traversal pass over 1..n same-traversal rules with a
    tag-indexed dispatch table (the compiled "transformation table").

    Per element the engine looks up ``dispatch[element.tag]`` (falling
    back to the tag-unconstrained plan) and only evaluates the residual
    matchers of rules that can possibly match that tag; a rule whose
    conditions are purely tag-driven therefore costs ZERO matcher calls
    per element. Rule order within a plan is preserved (merged sort by
    rule index), so semantics are identical to evaluating every rule.
    """

    __slots__ = ("crules", "traversal", "dispatch", "default_plan", "n")

    def __init__(self, crules):
        self.crules = tuple(crules)
        self.traversal = crules[0].traversal
        self.n = len(crules)
        constrained: dict = {}
        unconstrained = []
        for idx, c in enumerate(crules):
            domain, residual = _split_tag_domain(c.matchers)
            entry = (
                idx,
                tuple(m.fast_matches() for m in residual),
                c.chain,
            )
            if domain is None:
                unconstrained.append(entry)
            else:
                for tag in domain:
                    constrained.setdefault(tag, []).append(entry)
        self.default_plan = tuple(unconstrained)
        self.dispatch = {
            tag: tuple(sorted(entries + unconstrained, key=lambda e: e[0]))
            for tag, entries in constrained.items()
        }


class Transformation:
    """An ordered, reusable, picklable-free program over one document (C1).

    Config keys (reference defaults reconstructed):

    * ``copy`` (default True): deep-copy the source tree before mutating;
    * ``context``: initial context mapping;
    * ``common_rule_conditions``: conditions AND-ed onto every rule (C12);
    * ``result_object``: dotted path resolved over the run namespace at
      the end (default ``'context.root'`` == the transformed tree); ``None``
      returns ``None``;
    * ``traversal_order``: default traversal for rules without their own;
    * ``name``: diagnostic label.
    """

    config_defaults = {
        "copy": True,
        "context": None,
        "common_rule_conditions": None,
        "result_object": "context.root",
        "traversal_order": _DEFAULT_TRAVERSAL,
        "name": None,
        # opt-in optimization: execute consecutive same-traversal Rules
        # in ONE tree pass (element-major instead of rule-major order).
        # Only valid when the fused rules' handlers do not mutate the
        # tree or depend on a prior rule's full pass (e.g. pure
        # mark-for-removal accumulators); the flagship main_content
        # program qualifies — its doomed set and extracted bytes are
        # unchanged (locked by the golden conformance tests).
        "fuse_rules": False,
    }

    def __init__(self, *steps, **config):
        cfg = dict(self.config_defaults)
        cfg.update(config)
        self.config = SimpleNamespace(**cfg)
        common = compile_conditions(cfg["common_rule_conditions"])
        self.steps = []
        for i, step in enumerate(steps):
            if isinstance(step, Rule):
                self.steps.append(
                    _CompiledRule(step, common, self.config.traversal_order, i)
                )
            elif isinstance(step, Transformation):
                self.steps.append(step)  # sub-transformation as a step
            elif callable(step) or isinstance(step, (list, tuple)):
                self.steps.append(_CompiledSimpleStep(step, i))
            else:
                raise TypeError(f"unsupported step {step!r}")
        self._plan = self._compile_plan()

    def _compile_plan(self):
        """Group steps into the per-call execution plan ONCE.

        Consecutive same-traversal rules fuse into one :class:`_RuleGroup`
        (= one tree pass) when ``fuse_rules`` is on; otherwise each rule
        is its own group. Simple steps / sub-transformations pass through
        and break fusion runs, matching the former per-call grouping.
        """
        plan = []
        fuse = self.config.fuse_rules
        i, steps = 0, self.steps
        while i < len(steps):
            step = steps[i]
            if isinstance(step, _CompiledRule):
                group = [step]
                i += 1
                while (
                    fuse
                    and i < len(steps)
                    and isinstance(steps[i], _CompiledRule)
                    and steps[i].traversal == step.traversal
                ):
                    group.append(steps[i])
                    i += 1
                plan.append(("rules", _RuleGroup(group)))
            elif isinstance(step, _CompiledSimpleStep):
                plan.append(("simple", step.chain))
                i += 1
            else:
                plan.append(("xform", step))
                i += 1
        return plan

    # -- execution ---------------------------------------------------------
    def __call__(self, source, nsmap=None, **context_kwargs):
        result, _stats = self.call_with_stats(source, nsmap=nsmap, **context_kwargs)
        return result

    def call_with_stats(self, source, nsmap=None, **context_kwargs):
        """Run and also return per-rule hit counts ``{label: n}``."""
        root = source
        if not isinstance(root, Node):
            raise TypeError(f"source must be a rayxt.dom.Node, got {type(source)!r}")
        if self.config.copy:
            root = root.deepcopy()
        base_ctx = dict(self.config.context or {})
        base_ctx.update(context_kwargs)
        context = SimpleNamespace(**base_ctx)
        run = _Run(self, self.config, context, root, nsmap)
        # the (possibly copied) tree is reachable through the context too,
        # so the default result_object 'context.root' resolves (C11)
        context.root = root
        context.tree = root
        try:
            for kind, obj in self._plan:
                if kind == "rules":
                    self._run_group(obj, run)
                elif kind == "simple":
                    try:
                        obj(run)
                    except AbortRule:
                        continue
                else:  # sub-transformation
                    run.previous_result = obj(
                        run.root, nsmap=run.nsmap, **vars(run.context)
                    )
        except AbortTransformation:
            pass
        return self._resolve_result(run), run.rule_hits

    def _run_group(self, group: _RuleGroup, run: _Run):
        """One traversal applying the group's rules via tag dispatch.

        Identical observable semantics to evaluating every rule's full
        matcher list per element (rule order preserved inside each
        per-tag plan); a rule that hit AbortRule stays dormant for the
        rest of the pass, and when ALL rules are dormant the traversal
        stops early.
        """
        for crule in group.crules:
            for m in crule.matchers:
                m.prepare(run)
        n = group.n
        hits = [0] * n
        aborted = [False] * n
        alive = n
        dispatch_get = group.dispatch.get
        default_plan = group.default_plan
        try:
            for element in _iter_traversal(run.root, group.traversal):
                if element.detached:
                    continue
                plan = dispatch_get(element.tag, default_plan)
                for idx, matchfns, chain in plan:
                    if aborted[idx]:
                        continue
                    matched = True
                    for f in matchfns:
                        if not f(element, run):
                            matched = False
                            break
                    if not matched:
                        continue
                    hits[idx] += 1
                    run.element = element
                    try:
                        chain(run)
                    except AbortRule:
                        aborted[idx] = True
                        alive -= 1
                        if alive == 0:
                            raise _AllRulesAborted
                    if element.detached:
                        break
        except _AllRulesAborted:
            pass
        finally:
            run.element = None
            rule_hits = run.rule_hits
            for idx, crule in enumerate(group.crules):
                if hits[idx]:
                    rule_hits[crule.label] = (
                        rule_hits.get(crule.label, 0) + hits[idx]
                    )

    def _resolve_result(self, run: _Run):
        path = self.config.result_object
        if path is None:
            return None
        obj = run
        for part in path.split("."):
            if isinstance(obj, dict):
                obj = obj.get(part)
            else:
                obj = getattr(obj, part, None)
            if obj is None:
                return None
        return obj
