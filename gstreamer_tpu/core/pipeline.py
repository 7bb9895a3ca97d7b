"""Bin/Pipeline: graph container, trace-time negotiation, fused execution.

TPU-native re-design of GstBin/GstPipeline (reference:
subprojects/gstreamer/gst/gstbin.c — sorted state changes :2317;
gstpipeline.c — clock/base-time :377-433) and of the negotiation flow
(gst-docs design/negotiation.md, gstbasetransform.c find_transform :1093).

Execution model (replaces streaming threads + per-element chain calls):

* negotiation runs once, host-side, producing fixed caps per pad — the
  "shape/dtype/format inference" pass;
* every element contributes a pure device function; consecutive device
  elements are fused into ONE jitted XLA program per graph segment
  (queues and tees are structural; host-side elements like videorate
  split segments);
* the tick loop pulls a BATCH of frames from each source, runs the
  fused program(s), and hands results to sinks.  Batching is the
  replacement for the reference's pipeline-parallel threads
  (SURVEY §2.8).
"""

from __future__ import annotations

import itertools
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from .buffer import Buffer, FlowReturn
from .caps import Caps
from .element import (AggregatorElement, Element, Pad, PadDirection,
                      SinkElement, SourceElement, element_factory_make)
from .tracer import hooks
from ..utils.log import get_logger

log = get_logger("pipeline")


# ---------------------------------------------------------------------------
# Bus (gstbus.c equivalent — async element->app messages)
# ---------------------------------------------------------------------------

@dataclass
class Message:
    type: str                    # "eos" | "error" | "warning" | "state-changed" | ...
    src: Optional[str] = None
    data: Dict[str, Any] = field(default_factory=dict)

    def __repr__(self):
        return f"<Message {self.type} from {self.src}: {self.data}>"


class Bus:
    def __init__(self):
        self._queue: List[Message] = []
        self._watchers: List[Callable[[Message], None]] = []

    def post(self, msg: Message) -> None:
        log.debug("bus message: %s", msg)
        self._queue.append(msg)
        for w in self._watchers:
            w(msg)

    def pop(self) -> Optional[Message]:
        return self._queue.pop(0) if self._queue else None

    def pop_filtered(self, *types: str) -> Optional[Message]:
        for i, m in enumerate(self._queue):
            if m.type in types:
                return self._queue.pop(i)
        return None

    def add_watch(self, cb: Callable[[Message], None]) -> None:
        self._watchers.append(cb)

    def messages(self) -> List[Message]:
        return list(self._queue)


class State:
    NULL = "null"
    READY = "ready"
    PAUSED = "paused"
    PLAYING = "playing"


# ---------------------------------------------------------------------------
# Bin / Pipeline
# ---------------------------------------------------------------------------

class Bin(Element):
    FACTORY = "bin"

    def __init__(self, name: Optional[str] = None):
        super().__init__(name=name)
        self.elements: List[Element] = []

    def add(self, *elements: Element) -> None:
        for e in elements:
            if e.parent is not None:
                raise ValueError(f"{e.name} already in a bin")
            e.parent = self
            self.elements.append(e)

    def get_by_name(self, name: str) -> Optional[Element]:
        for e in self.elements:
            if e.name == name:
                return e
            if isinstance(e, Bin):
                r = e.get_by_name(name)
                if r is not None:
                    return r
        return None

    def iterate_elements(self) -> List[Element]:
        out = []
        for e in self.elements:
            if isinstance(e, Bin):
                out.extend(e.iterate_elements())
            else:
                out.append(e)
        return out

    def add_ghost_pad(self, name: str, target) -> "Pad":
        """Expose an internal element's pad on the bin boundary
        (gst_ghost_pad_new + gst_element_add_pad)."""
        from .element import GhostPad
        gp = GhostPad(name, target, owner=self)
        self.pads.append(gp)
        return gp


def link(src: Element, sink: Element,
         srcpad: Optional[str] = None, sinkpad: Optional[str] = None) -> None:
    """gst_element_link_pads equivalent: first CAPS-COMPATIBLE pads
    (gst_pad_can_link: template caps must intersect when picking among
    several sink templates, e.g. a muxer's video_%u vs audio_%u)."""
    spads = [src.get_pad(srcpad)] if srcpad else [
        p for p in src.src_pads() if p.peer is None]
    if not spads:
        # try request pads
        for t in src.PAD_TEMPLATES:
            if t.direction == PadDirection.SRC and t.presence == "request":
                spads = [src.request_pad(t.name)]
                break

    src_caps = None
    if spads:
        src_caps = spads[0].template_caps
        # a capsfilter's configured caps are more precise than its
        # ANY templates (the common `... ! audio/x-raw,... ! mux` case)
        cf = getattr(src, "props", {}).get("caps")
        if cf is not None:
            src_caps = cf

    def _compatible(sink_caps) -> bool:
        if src_caps is None:
            return True
        try:
            return not src_caps.intersect(sink_caps).is_empty
        except Exception:
            return True

    kpads = [sink.get_pad(sinkpad)] if sinkpad else [
        p for p in sink.sink_pads() if p.peer is None]
    if not sinkpad and kpads:
        ranked = [p for p in kpads if _compatible(p.template_caps)]
        kpads = ranked or kpads
    if not kpads:
        tmpls = [t for t in sink.PAD_TEMPLATES
                 if t.direction == PadDirection.SINK
                 and t.presence == "request"]
        from .caps import Caps as _Caps
        ranked = [t for t in tmpls
                  if _compatible(_Caps.from_string(t.caps)
                                 if isinstance(t.caps, str) else t.caps)]
        for t in (ranked or tmpls):
            kpads = [sink.request_pad(t.name)]
            break
    if not spads or not kpads:
        raise ValueError(f"cannot link {src.name} ! {sink.name}: no free pads")
    spads[0].link(kpads[0])


class Pipeline(Bin):
    FACTORY = "pipeline"

    def __init__(self, name: Optional[str] = None):
        super().__init__(name=name)
        self.bus = Bus()
        self.state = State.NULL
        self._plan = None
        self.default_batch = 1
        # compiled-program cache keyed by the negotiated caps configuration
        # (the XLA analog of the reference's per-caps transform state;
        # lets mid-stream caps switches reuse earlier compilations)
        self._program_cache: Dict[tuple, dict] = {}
        self.compile_count = 0          # cache misses (observable in tests)
        self._position_ns = 0
        self._mesh = None
        self._staged = None
        self._prefetch = False
        self._pending_reconf = False
        self.clock = None              # pipeline clock (use_clock)

    def use_clock(self, clock) -> None:
        """Force the pipeline clock (gst_pipeline_use_clock;
        selection normally happens at PLAYING, gstpipeline.c:433).
        Pass a check.testclock.TestClock for deterministic timing
        tests — clock-aware elements (clocksync) then hold buffers
        until the clock is cranked past their timestamps."""
        self.clock = clock

    def get_clock(self):
        return self.clock

    # -- graph helpers -----------------------------------------------------
    def _nodes(self) -> List[Element]:
        return self.iterate_elements()

    def _topo_order(self) -> List[Element]:
        nodes = self._nodes()
        indeg = {e: 0 for e in nodes}
        for e in nodes:
            for p in e.sink_pads():
                if p.peer is not None:
                    indeg[e] += 1
        order, ready = [], [e for e in nodes if indeg[e] == 0]
        while ready:
            e = ready.pop(0)
            order.append(e)
            for p in e.src_pads():
                if p.peer is not None:
                    d = p.peer.element
                    indeg[d] -= 1
                    if indeg[d] == 0:
                        ready.append(d)
        if len(order) != len(nodes):
            raise ValueError("pipeline graph has a cycle")
        return order

    # -- negotiation (trace-time caps resolution) --------------------------
    @staticmethod
    def _strip_features(caps: Caps) -> Caps:
        """Transforms are memory-agnostic: explicit caps features
        constrain only the link they were written on, not everything a
        transform can produce/accept on its other side."""
        if caps is None or caps.is_any or not caps.structures:
            return caps
        if all(st.features is None for st in caps.structures):
            return caps
        out = []
        for st in caps.structures:
            st = st.copy()
            st.features = None
            out.append(st)
        return Caps(out)

    def _downstream_allowed(self, pad: Pad, _memo=None) -> Caps:
        """Allowed caps on a SRC pad considering everything downstream
        (the recursive CAPS query, gstbasetransform query_caps :632)."""
        if _memo is None:
            _memo = {}
        if pad in _memo:
            return _memo[pad]
        peer = pad.peer
        if peer is None:
            res = pad.template_caps
        else:
            elem = peer.element
            sink_tmpl = peer.template_caps
            if isinstance(elem, SinkElement) or not elem.src_pads():
                res = sink_tmpl
            elif isinstance(elem, AggregatorElement):
                res = sink_tmpl
            else:
                down = Caps.any()
                for sp in elem.src_pads():
                    if sp.peer is not None:
                        down = down.intersect(self._downstream_allowed(sp, _memo))
                    else:
                        down = down.intersect(sp.template_caps)
                res = elem.transform_caps(
                    PadDirection.SRC, self._strip_features(down),
                    filter=sink_tmpl)
        res = res.intersect(pad.template_caps)
        _memo[pad] = res
        return res

    def negotiate(self) -> None:
        order = self._topo_order()
        # reset any previous negotiation (renegotiation path: the sticky
        # CAPS state is replaced, gstevent.c:905)
        for elem in order:
            for p in elem.pads:
                p.caps = None
        for elem in order:
            if getattr(elem, "MULTI_STREAM", False) and elem.is_multi():
                # one-parse multi-stream demuxer: each exposed
                # sometimes-pad negotiates its own stream caps
                # (qtdemux.c pad-per-track analog)
                for srcpad in elem.multi_pads():
                    allowed = self._downstream_allowed(srcpad)
                    caps_space = elem.get_caps_for_pad(
                        srcpad, filter=allowed)
                    if caps_space.is_empty:
                        raise NegotiationError(
                            f"{elem.name}.{srcpad.name}: no common "
                            f"caps with downstream")
                    fixed = elem.fixate_for_pad(srcpad, caps_space)
                    if not fixed.is_fixed():
                        raise NegotiationError(
                            f"{elem.name}.{srcpad.name}: could not "
                            f"fixate {fixed!r}")
                    srcpad.caps = fixed
                    log.info("%s.%s: negotiated %s", elem.name,
                             srcpad.name, fixed)
                continue
            if isinstance(elem, SourceElement):
                srcpad = elem.src_pads()[0]
                allowed = self._downstream_allowed(srcpad)
                caps_space = elem.get_caps(filter=allowed)
                if caps_space.is_empty:
                    raise NegotiationError(
                        f"{elem.name}: no common caps with downstream")
                fixed = elem.fixate(caps_space)
                if not fixed.is_fixed():
                    raise NegotiationError(
                        f"{elem.name}: could not fixate {fixed!r}")
                srcpad.caps = fixed
                elem.set_info(None, fixed)
                log.info("%s: negotiated %s", elem.name, fixed)
            elif isinstance(elem, AggregatorElement):
                in_caps = {p.name: p.peer.caps for p in elem.sink_pads()
                           if p.peer is not None}
                if any(c is None for c in in_caps.values()):
                    raise NegotiationError(
                        f"{elem.name}: sink pad not negotiated")
                for p in elem.sink_pads():
                    if p.peer is not None:
                        p.caps = p.peer.caps
                srcpad = elem.src_pads()[0]
                allowed = self._downstream_allowed(srcpad)
                out = elem.negotiate_output(in_caps, allowed)
                srcpad.caps = out
                log.info("%s: negotiated out %s", elem.name, out)
            elif isinstance(elem, SinkElement):
                for p in elem.sink_pads():
                    if p.peer is not None:
                        p.caps = p.peer.caps
                elem.set_info(elem.sink_pads()[0].caps, None)
            else:
                # transform: find_transform (gstbasetransform.c:1093)
                sinkpad = elem.sink_pads()[0]
                if sinkpad.peer is None:
                    raise NegotiationError(f"{elem.name}: sink pad not linked")
                incaps = sinkpad.peer.caps
                if incaps is None:
                    raise NegotiationError(
                        f"{elem.name}: upstream not negotiated")
                sinkpad.caps = incaps
                srcpads = [p for p in elem.src_pads() if p.peer is not None]
                if not srcpads:
                    elem.set_info(incaps, None)
                    continue
                srcpad = srcpads[0]
                # multi-src transforms (tee): every branch must accept the
                # same caps — intersect all downstream constraints
                allowed = Caps.any()
                for sp in srcpads:
                    allowed = allowed.intersect(self._downstream_allowed(sp))
                othercaps = elem.transform_caps(
                    PadDirection.SINK, self._strip_features(incaps),
                    filter=allowed)
                if othercaps.is_empty:
                    raise NegotiationError(
                        f"{elem.name}: cannot transform {incaps!r} to anything "
                        f"downstream accepts")
                if not othercaps.is_fixed():
                    othercaps = elem.fixate_caps(
                        PadDirection.SINK, self._strip_features(incaps),
                        othercaps)
                if not othercaps.is_fixed():
                    raise NegotiationError(
                        f"{elem.name}: fixation failed: {othercaps!r}")
                for sp in srcpads:
                    sp.caps = othercaps
                elem.set_info(incaps, othercaps)
                log.info("%s: negotiated %s -> %s", elem.name, incaps, othercaps)
        self._resolve_memory_features(order)

    def _resolve_memory_features(self, order) -> None:
        """Assign concrete memory caps-features per negotiated link
        (gstcapsfeatures.c analog; memory:GLMemory precedent).

        Links whose caps carry EXPLICIT features (from user capsfilters)
        keep them — an explicit memory:Host/SystemMemory demand between
        two device elements forces a host boundary (D2H+H2D round
        trip), recorded in ``self._forced_host_elems`` for compile().
        Remaining links resolve to memory:HBM when both endpoints run
        on device (inside the fused program) and memory:SystemMemory
        across host boundaries."""
        from .structure import CapsFeatures

        self._forced_host_elems = set()

        def is_device(e) -> bool:
            if getattr(e, "HOST_ELEMENT", False):
                return False
            if isinstance(e, SourceElement):
                try:
                    return e.generator_fn() is not None
                except Exception:
                    return False
            return True

        # pass 1 — detect EXPLICIT host demands (user capsfilters)
        # before resolution writes any features of its own
        for e in order:
            if (not getattr(e, "HOST_ELEMENT", False)
                    and not isinstance(e, (SourceElement, SinkElement))):
                for p in e.sink_pads():
                    if p.caps is None or not len(p.caps):
                        continue
                    f = p.caps[0].features
                    if f is not None and f.is_sysmem():
                        self._forced_host_elems.add(e)
        # pass 2 — resolve remaining links
        for e in order:
            for sp in e.src_pads():
                if sp.peer is None or sp.caps is None or not len(sp.caps):
                    continue
                s0 = sp.caps[0]
                if s0.features is not None:
                    continue                        # explicit: keep
                down = sp.peer.element
                hbm = is_device(e) and is_device(down)
                s0 = s0.copy()
                s0.features = CapsFeatures(
                    CapsFeatures.HBM if hbm else CapsFeatures.SYSMEM)
                new_caps = Caps([s0])
                sp.caps = new_caps
                sp.peer.caps = new_caps

    # -- compile (build fused device programs) -----------------------------
    def _caps_signature(self, order) -> tuple:
        return tuple((e.name, p.name, str(p.caps))
                     for e in order for p in e.pads)

    def compile(self, batch: Optional[int] = None, mesh=None,
                donate_inputs: bool = False,
                prefetch: bool = False) -> None:
        """Negotiate and build the fused device program.

        mesh: optional jax.sharding.Mesh — the batch axis is sharded
        over its first ("dp") axis and the fused program runs under
        shard_map (each chip processes its batch shard; per-frame DSP
        has no cross-batch dependence, so this is exact data
        parallelism over ICI — SURVEY §2.8).  Batch must divide the dp
        axis size.

        donate_inputs: donate the source staging buffers to the fused
        program (jit donate_argnums) — XLA reuses their HBM for
        intermediates/outputs instead of allocating fresh, the
        GstBufferPool recycling analog (gstbufferpool.c:125) for
        streaming ingest where every tick brings new host data.

        prefetch: double-buffered ingest — the NEXT tick's source
        buffers are pulled and device_put immediately after dispatching
        the current tick's program, so H2D transfer overlaps device
        compute (the queue-decoupling analog, gstqueue.c:211)."""
        import jax

        from .xla_cache import ensure_persistent_cache
        ensure_persistent_cache()
        hooks.load_env()
        self.negotiate()
        hooks.fire("pipeline-negotiated", self)
        from ..utils.dot import maybe_dump
        maybe_dump(self)
        order = self._topo_order()
        batch = batch or self.default_batch
        if mesh is not None:
            self._mesh = mesh
            dp = mesh.shape[mesh.axis_names[0]]
            if batch % dp:
                raise ValueError(
                    f"batch {batch} not divisible by dp axis {dp}")
        else:
            self._mesh = None
        self._prefetch = prefetch
        self._donate = donate_inputs
        self._staged = None

        key = (self._caps_signature(order), batch, donate_inputs,
               None if mesh is None else
               (tuple(mesh.axis_names), tuple(mesh.devices.shape)))
        cached = self._program_cache.get(key)
        if cached is not None:
            # same caps configuration seen before: reuse the compiled
            # program (elements' set_info just reconfigured identically)
            self.__dict__.update(cached)
            self._elem_states = None      # streaming state never cached
            self._plan = True
            return

        # per-element pure fns
        fns: Dict[Element, Optional[Callable]] = {}
        scan_fns: Dict[Element, tuple] = {}
        dyn_elems: Dict[Element, tuple] = {}   # controlled-prop inputs
        for e in order:
            if isinstance(e, SourceElement):
                fns[e] = e.generator_fn()
            elif isinstance(e, AggregatorElement):
                fns[e] = e.aggregate_fn()
            elif isinstance(e, SinkElement):
                fns[e] = None
            else:
                sf = e.make_scan_fn()
                if sf is not None:
                    scan_fns[e] = sf
                    fns[e] = None
                elif e.dyn_props() and mesh is None:
                    # (under a mesh the dyn scalars would need their
                    # own replicated sharding spec; fall back to the
                    # static fn there — animation via reconfigure)
                    dfn = e.make_dyn_fn()
                    fns[e] = dfn if dfn is not None else e.make_fn()
                    if dfn is not None:
                        dyn_elems[e] = tuple(sorted(e.dyn_props()))
                else:
                    fns[e] = e.make_fn()

        host_elems = {e for e in order if getattr(e, "HOST_ELEMENT", False)}
        # explicit memory:Host caps features force a host boundary on
        # device-capable elements (negotiated in
        # _resolve_memory_features; the GL upload/download analog)
        forced = getattr(self, "_forced_host_elems", set()) & set(order)
        for e in order:
            e._forced_host = False
        for e in forced:
            e._forced_host = True
            host_elems.add(e)
        # queue decoupling (gstqueue.c:211 thread decoupling analog):
        # when host elements already split the program, a queue becomes a
        # one-tick double buffer — downstream consumes tick N-1's data
        # while tick N's device work runs asynchronously.  In fully
        # fused pipelines queues stay structural (fusion beats any
        # decoupling).
        if host_elems:
            for e in order:
                if (e.FACTORY in ("queue", "queue2")
                        and e.props.get("leaky", "no") == "no"):
                    e._decouple = True
                    e._pending_buf = None
                    host_elems.add(e)
        if scan_fns and mesh is not None:
            raise NotImplementedError(
                "stateful scan elements are sequential over the batch "
                "axis and cannot be dp-sharded")
        self._fns = fns
        self._scan_fns = scan_fns
        self._dyn_elems = dyn_elems
        self._host_elems = host_elems
        self._fused = not host_elems
        self._elem_states = None

        if self._fused:
            def device_step(inputs: Dict[str, Any], states: Dict[str, Any]):
                """ONE fused XLA program: all pure element fns in topo
                order; tee fan-out is value reuse inside the trace;
                stateful elements lax.scan over the batch axis with
                their carry threaded through (states in -> states out,
                kept in HBM between ticks)."""
                values: Dict[Pad, Any] = {}
                outputs: Dict[str, Any] = {}
                new_states: Dict[str, Any] = {}
                for e in order:
                    if isinstance(e, SourceElement):
                        if getattr(e, "MULTI_STREAM", False) \
                                and e.is_multi():
                            for sp in e.src_pads():
                                key = f"{e.name}:{sp.name}"
                                if key in inputs:
                                    values[sp] = inputs[key]
                            continue
                        v = inputs[e.name]
                        if fns[e] is not None:
                            v = fns[e](v)
                        for sp in e.src_pads():
                            values[sp] = v
                    elif isinstance(e, SinkElement):
                        pad = e.sink_pads()[0]
                        if pad.peer is not None and pad.peer in values:
                            outputs[e.name] = values[pad.peer]
                    elif isinstance(e, AggregatorElement):
                        ins = {p.name: values[p.peer] for p in e.sink_pads()
                               if p.peer is not None}
                        v = fns[e](ins) if fns[e] is not None else ins
                        for sp in e.src_pads():
                            values[sp] = v
                    else:
                        pads = [p for p in e.sink_pads()
                                if p.peer is not None
                                and p.peer in values]
                        if not pads:
                            continue
                        v = values[pads[0].peer]
                        if e in scan_fns:
                            step, _ = scan_fns[e]
                            aux = inputs.get(e.name + "__aux")
                            xs = v if aux is None else (v, aux)
                            carry, v = jax.lax.scan(step, states[e.name],
                                                    xs)
                            new_states[e.name] = carry
                        elif fns[e] is not None:
                            dyn = inputs.get(e.name + "__dyn")
                            v = (fns[e](v, dyn) if dyn is not None
                                 else fns[e](v))
                        for sp in e.src_pads():
                            values[sp] = v
                return outputs, new_states

            jitted = jax.jit(
                self._maybe_shard(device_step, mesh),
                donate_argnums=(0,) if donate_inputs else ())
            if donate_inputs:
                # Donation is best-effort HBM recycling: XLA aliases a
                # donated input into an output only when shape/dtype
                # match.  A convert+scale input (e.g. 1080p Y plane ->
                # 224x224 RGB out) has no aliasing target; the failed
                # donation is free (the staging buffer is released
                # either way, no extra copy happens), so the advisory
                # "donated buffers were not usable" warning is noise
                # here — silence just that message.
                import functools
                import warnings as _warnings

                @functools.wraps(jitted)
                def _quiet(*a, **kw):
                    with _warnings.catch_warnings():
                        _warnings.filterwarnings(
                            "ignore",
                            message="Some donated buffers were not "
                                    "usable")
                        return jitted(*a, **kw)
                self._device_step = _quiet
            else:
                self._device_step = jitted
        else:
            # host elements present: per-element execution — each pure
            # element's fn is jitted on its own (still device compute,
            # less cross-element fusion)
            self._device_step = None
            self._elem_jit = {
                e: jax.jit(self._maybe_shard(f, mesh))
                for e, f in fns.items() if f is not None
                and (e not in host_elems
                     or getattr(e, "_forced_host", False))}

            def _scan_runner(step):
                return jax.jit(lambda c, xs: jax.lax.scan(step, c, xs))

            self._elem_scan_jit = {
                e: _scan_runner(step) for e, (step, _) in scan_fns.items()}

        self._order = order
        self._batch = batch
        self._plan = True
        self.compile_count += 1
        self._program_cache[key] = {
            k: self.__dict__[k] for k in
            ("_fns", "_scan_fns", "_dyn_elems", "_host_elems", "_fused",
             "_device_step", "_order", "_batch", "_mesh")}
        if not self._fused:
            self._program_cache[key]["_elem_jit"] = self._elem_jit
            self._program_cache[key]["_elem_scan_jit"] = self._elem_scan_jit

    def _distribute_sticky(self) -> None:
        """Push STREAM_START + CAPS + SEGMENT through the graph via the
        real pad event flow (gstpad.c sticky replay): every pad ends up
        holding its sticky set, elements see sink_event in order."""
        from .events import caps_event, segment_event, stream_start_event
        from .segment import Segment

        for e in self._order:
            if isinstance(e, SourceElement):
                for sp in e.src_pads():
                    if sp.peer is None:
                        continue
                    sid = f"{self.name}/{e.name}"
                    sp.push_event(stream_start_event(sid))
                    if sp.caps is not None:
                        sp.push_event(caps_event(sp.caps))
                    sp.push_event(segment_event(Segment()))

    @staticmethod
    def _maybe_shard(fn, mesh):
        """Multi-chip wrapping of a pure element/graph function.

        1-D mesh ("dp"): shard_map over the batch axis — exact data
        parallelism, no cross-shard traffic (per-frame DSP has no
        cross-batch dependence).

        2-D mesh ("dp", "sp"): the spatial axis shards frame ROWS across
        chips (the sequence-parallel analog for frames larger than one
        chip's working set, SURVEY §2.8/§5).  Vertical filter taps read
        across shard boundaries, so the function is left unwrapped and
        jitted with GSPMD-sharded inputs — XLA inserts the halo
        exchange collectives for the tap overlap automatically."""
        if mesh is None or fn is None:
            return fn
        if len(mesh.axis_names) > 1:          # dp x sp: GSPMD partitioning
            return fn
        import jax
        from jax.sharding import PartitionSpec as P
        try:
            shard_map = jax.shard_map
        except AttributeError:      # older jax
            from jax.experimental.shard_map import shard_map

        dp = mesh.axis_names[0]
        spec = P(dp)
        try:
            return shard_map(fn, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False)
        except TypeError:       # older jax spells it check_rep
            return shard_map(fn, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_rep=False)

    def _shard_inputs(self, tree):
        if self._mesh is None:
            return tree
        mesh = self._mesh
        if len(mesh.axis_names) > 1:
            # dp x sp: batch over dp, frame rows over sp (rank-3+ video
            # planes); lower-rank leaves (audio chunks) stay dp-only
            import jax
            import numpy as np
            from jax.sharding import NamedSharding, PartitionSpec as P
            dp, sp = mesh.axis_names[0], mesh.axis_names[1]

            def place(x):
                if np.ndim(x) >= 3:
                    spec = [None] * np.ndim(x)
                    spec[0], spec[1] = dp, sp
                else:
                    spec = [None] * max(1, np.ndim(x))
                    spec[0] = dp
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))

            return jax.tree_util.tree_map(place, tree)
        from ..parallel.sharding import shard_batched_pytree
        return shard_batched_pytree(self._mesh, tree,
                                    axis=mesh.axis_names[0])

    # -- run loop ----------------------------------------------------------
    def set_state(self, state: str) -> None:
        if state == State.PLAYING and self.state != State.PLAYING:
            if self._plan is None:
                self.compile()
            for e in self._order:
                e.start()
            self._distribute_sticky()
            self.state = State.PLAYING
            self.bus.post(Message("state-changed", self.name,
                                  {"new": State.PLAYING}))
        elif state in (State.NULL, State.READY):
            if self.state == State.PLAYING:
                for e in self._order:
                    e.stop()
            self.state = state

    def _reconfigure(self) -> None:
        """Mid-stream caps change: renegotiate + recompile (cache-aware),
        replay sticky CAPS events.  The RECONFIGURE/CAPS-event path of the
        reference (gstbasetransform.c:1341 setcaps, gstevent.c:905)."""
        log.info("%s: reconfiguring (mid-stream caps change)", self.name)
        self.compile(batch=self._batch, mesh=self._mesh)
        for e in self._order:
            e.start()
        self._distribute_sticky()
        self.bus.post(Message("caps-changed", self.name))

    def _stage_buf(self, buf: Buffer) -> Buffer:
        """Device-stage a pulled buffer (shard under a mesh; async H2D
        in the fused path so dispatch never consumes an in-flight host
        transfer — measured 6.6 -> 447 fps on the dev tunnel)."""
        if self._mesh is not None:
            return buf.with_(data=self._shard_inputs(buf.data))
        if not self._fused:
            return buf
        import jax
        import numpy as _np

        def _stage(x):
            if isinstance(x, (str, bytes, bytearray)):
                return x             # text cues stay on host
            if isinstance(x, _np.ndarray) \
                    and not x.flags["C_CONTIGUOUS"]:
                # strided views (plane slices) hit a slow
                # element-wise transfer path; a host memcpy
                # first is ~10x cheaper than the difference
                x = _np.ascontiguousarray(x)
            return jax.device_put(x)
        return buf.with_(data=jax.tree_util.tree_map(_stage, buf.data))

    def _pull_sources(self, sources):
        """Pull one batch from every source, device-staging the data.
        Returns (inputs, metas) or None at EOS.  Multi-stream demuxers
        contribute one entry per exposed pad, keyed "name:pad"."""
        inputs: Dict[str, Any] = {}
        metas: Dict[str, Buffer] = {}
        for s in sources:
            if getattr(s, "MULTI_STREAM", False) and s.is_multi():
                bufs = s.create_multi(self._batch)
                if bufs is None:
                    return None
                for pname, buf in bufs.items():
                    if not s.stream_selected(pname):
                        # deselected stream: zero the payload, keep
                        # the static input signature (see
                        # MultiStreamSourceElement.select_streams)
                        import numpy as _np

                        def _zero(x):
                            if isinstance(x, (tuple, list)):
                                return type(x)(_zero(v) for v in x)
                            return _np.zeros_like(_np.asarray(x))
                        buf = buf.with_(data=_zero(buf.data))
                    buf = self._stage_buf(buf)
                    inputs[f"{s.name}:{pname}"] = buf.data
                    metas[f"{s.name}:{pname}"] = buf
                continue
            buf = s.create(self._batch)
            if buf is None:
                return None
            buf = self._stage_buf(buf)
            inputs[s.name] = buf.data
            metas[s.name] = buf
        return inputs, metas

    def tick(self) -> bool:
        """Run one batch through the graph.  False on EOS."""
        if self.state != State.PLAYING:
            self.set_state(State.PLAYING)
        sources = [e for e in self._order if isinstance(e, SourceElement)]
        if not sources:
            raise RuntimeError("pipeline has no sources")
        # mid-stream caps change? (CAPS event / RECONFIGURE mark)
        if getattr(self, "_pending_reconf", False) or (
                self._staged is None
                and any(s.check_reconfigure() for s in sources)):
            self._pending_reconf = False
            self._reconfigure()
            sources = [e for e in self._order
                       if isinstance(e, SourceElement)]
        if self._staged is not None:
            pulled = self._staged
            self._staged = None
        else:
            pulled = self._pull_sources(sources)
        eos = pulled is None
        if not eos:
            inputs, metas = pulled
        if eos:
            # flush decoupling queues (each holds one pending tick)
            if not self._fused:
                for _ in range(len(self._order)):
                    if not any(getattr(e, "_pending_buf", None) is not None
                               for e in self._order):
                        break
                    self._propagate({}, {}, {}, drain=True)
            from .events import eos_event
            for s in sources:
                for sp in s.src_pads():
                    sp.push_event(eos_event())
            self.bus.post(Message("eos", self.name))
            hooks.fire("eos", self)
            return False
        hooks.fire("tick-pre", self)

        # stateful scan elements: lazily init carries, compute per-tick
        # host aux inputs (phase counters, PRNG draws)
        if self._scan_fns:
            import jax
            import jax.numpy as jnp
            if self._elem_states is None:
                self._elem_states = {
                    e.name: jax.tree_util.tree_map(jnp.asarray, init)
                    for e, (_, init) in self._scan_fns.items()}
            # aux length = the ACTUAL batch this tick (the leading axis
            # of the flowing data, not the configured pull size)
            lead = jax.tree_util.tree_leaves(inputs)[0]
            nb = int(lead.shape[0])
            for e in self._scan_fns:
                aux = e.scan_aux(nb)
                if aux is not None:
                    inputs[e.name + "__aux"] = aux

        if getattr(self, "_dyn_elems", None):
            ts = self._position_ns
            for m in metas.values():
                if getattr(m, "pts", None) is not None:
                    ts = m.pts
                    break
            for e, props in self._dyn_elems.items():
                import numpy as _np
                inputs[e.name + "__dyn"] = {
                    p: _np.float32(e._dyn_sources[p].value_at(ts))
                    for p in props}

        outputs: Dict[str, Any] = {}
        if self._fused:
            try:
                import jax
                # wait for staged input transfers to land before
                # dispatching (free when prefetch already overlapped
                # them with the previous tick's compute)
                jax.block_until_ready(
                    {k: v for k, v in inputs.items()
                     if not k.endswith("__dyn")})
                outputs, new_states = self._device_step(
                    inputs, self._elem_states or {})
                if self._scan_fns:
                    self._elem_states = dict(self._elem_states or {},
                                             **new_states)
            except Exception as e:
                self.bus.post(Message("error", self.name, {"error": str(e)}))
                raise
            # double-buffered ingest: stage the NEXT tick's inputs now so
            # the H2D transfer overlaps the device execution just queued
            if self._prefetch:
                if any(s.check_reconfigure() for s in sources):
                    self._pending_reconf = True
                else:
                    self._staged = self._pull_sources(sources)

        if not self._propagate(inputs, metas, outputs):
            return False
        hooks.fire("tick-post", self)
        return True

    def _propagate(self, inputs, metas, outputs, drain: bool = False):
        """Buffer propagation through the graph (metadata always
        host-side; data host-side only in the non-fused per-element
        path).  drain=True: sources contribute nothing — decoupling
        queues flush their pending buffers (EOS drain)."""
        buf_by_pad: Dict[Pad, Buffer] = {}
        for e in self._order:
            if isinstance(e, SourceElement):
                if drain:
                    continue
                if getattr(e, "MULTI_STREAM", False) and e.is_multi():
                    for sp in e.src_pads():
                        m = metas.get(f"{e.name}:{sp.name}")
                        if m is not None:
                            buf_by_pad[sp] = m
                    continue
                buf = metas[e.name]
                if not self._fused and self._fns.get(e) is not None:
                    buf = buf.with_(data=self._elem_jit[e](buf.data))
                for sp in e.src_pads():
                    buf_by_pad[sp] = buf
            elif isinstance(e, SinkElement):
                pad = e.sink_pads()[0]
                if pad.peer is None or pad.peer not in buf_by_pad:
                    continue
                buf = buf_by_pad[pad.peer]
                if self._fused:
                    if e.name not in outputs:
                        continue      # upstream stream ended this tick
                    buf = buf.with_(data=outputs[e.name])
                buf = e.process_meta(buf)
                if hooks.active:
                    hooks.fire("buffer-pre", e, buf)
                ret = e.render(buf)
                if hooks.active:
                    hooks.fire("buffer-post", e, buf)
                    hooks.fire("flow-return", e, ret)
                if buf.pts is not None:
                    end = buf.pts + (buf.duration or 0) * max(
                        getattr(buf, "batch", 1), 1)
                    self._position_ns = max(self._position_ns, end)
                if ret == FlowReturn.ERROR:
                    self.bus.post(Message("error", e.name, {}))
                    return False
            elif isinstance(e, AggregatorElement):
                pads = [p for p in e.sink_pads()
                        if p.peer is not None and p.peer in buf_by_pad]
                if not pads:
                    continue
                buf = buf_by_pad[pads[0].peer]
                if (not self._fused and e in self._host_elems
                        and hasattr(e, "host_aggregate")):
                    ins_bufs = {p.name: buf_by_pad[p.peer] for p in pads}
                    buf = e.host_aggregate(ins_bufs)
                    if buf is None:
                        continue
                elif not self._fused and self._fns.get(e) is not None:
                    ins = {p.name: buf_by_pad[p.peer].data for p in pads}
                    buf = buf.with_(data=self._elem_jit[e](ins))
                buf = e.process_meta(buf)
                for sp in e.src_pads():
                    buf_by_pad[sp] = buf
            else:
                pads = [p for p in e.sink_pads()
                        if p.peer is not None and p.peer in buf_by_pad]
                if not pads:
                    if (drain and not self._fused
                            and e in self._host_elems
                            and getattr(e, "_decouple", False)
                            and getattr(e, "_pending_buf", None)
                            is not None):
                        buf = e.host_process(None)     # flush the queue
                    else:
                        continue
                else:
                    buf = buf_by_pad[pads[0].peer]
                    if not self._fused:
                        if getattr(e, "_forced_host", False):
                            # explicit memory:Host boundary: D2H round
                            # trip (downstream device fns re-upload)
                            import jax
                            import numpy as _np
                            buf = buf.with_(data=jax.tree_util.tree_map(
                                _np.asarray, buf.data))
                            if self._fns.get(e) is not None:
                                buf = buf.with_(
                                    data=self._elem_jit[e](buf.data))
                        elif e in self._host_elems:
                            buf = e.host_process(buf)
                        elif e in self._scan_fns:
                            xs = buf.data
                            aux = inputs.get(e.name + "__aux")
                            if aux is not None:
                                xs = (xs, aux)
                            carry, v = self._elem_scan_jit[e](
                                self._elem_states[e.name], xs)
                            self._elem_states[e.name] = carry
                            buf = buf.with_(data=v)
                        elif self._fns.get(e) is not None:
                            dyn = inputs.get(e.name + "__dyn")
                            if dyn is None and e in getattr(
                                    self, "_dyn_elems", {}):
                                import numpy as _np
                                dyn = {p: _np.float32(
                                    e._dyn_sources[p].value_at(
                                        self._position_ns))
                                    for p in self._dyn_elems[e]}
                            if dyn is not None:
                                buf = buf.with_(
                                    data=self._elem_jit[e](buf.data,
                                                           dyn))
                            else:
                                buf = buf.with_(
                                    data=self._elem_jit[e](buf.data))
                if buf is None:   # host element swallowed the buffer
                    continue
                buf = e.process_meta(buf)
                if hooks.active:
                    hooks.fire("buffer-post", e, buf)
                route = getattr(e, "route_outputs", None)
                if route is not None:
                    # one-to-N elements with DIFFERENT data per src pad
                    # (deinterleave): element splits the buffer itself
                    routed = route(buf)
                    for sp in e.src_pads():
                        if sp.name in routed:
                            buf_by_pad[sp] = routed[sp.name]
                else:
                    for sp in e.src_pads():
                        buf_by_pad[sp] = buf
        return True

    def run(self, max_ticks: Optional[int] = None) -> None:
        """Run until EOS (gst-launch main loop equivalent)."""
        n = 0
        while max_ticks is None or n < max_ticks:
            if not self.tick():
                break
            n += 1
        self.set_state(State.NULL)

    # -- seek / flush (gstevent.c SEEK + FLUSH_START/STOP semantics) ------
    def seek(self, start: int, stop: Optional[int] = None,
             rate: float = 1.0, flush: bool = True) -> bool:
        """Seek every source to `start` (ns) and flush element state.

        Mirrors gst_element_seek on the pipeline: the SEEK event travels
        to the sources; a flushing seek resets the streaming state of
        every element (here: the host-side histories)."""
        from .segment import Segment

        if self._plan is None:
            self.compile()
        # elements must be started before seeking (set_state would reset
        # their positions otherwise)
        if self.state != State.PLAYING:
            self.set_state(State.PLAYING)
        seg = Segment(rate=rate, start=start,
                      stop=stop if stop is not None else -1, time=start,
                      position=start)
        ok = False
        for e in self._order:
            if isinstance(e, SourceElement) and hasattr(e, "do_seek"):
                if e.do_seek(seg):
                    ok = True
        if flush:
            for e in self._order:
                if getattr(e, "HOST_ELEMENT", False) or hasattr(e, "flush"):
                    fl = getattr(e, "flush", None)
                    if fl is not None:
                        fl()
                    else:
                        e.start()     # host elements reset their history
        if ok:
            self.bus.post(Message("segment", self.name,
                                  {"start": start, "rate": rate}))
        return ok

    # -- queries (gstquery.c:2936 family, answered at the pipeline level
    #    like gst_element_query on a bin: sinks first, walk upstream) ------
    def query(self, q) -> bool:
        from .query import QueryType

        if self._plan is None:
            try:
                self.compile()
            except Exception:
                return False
        if q.type == QueryType.POSITION:
            q.result["position"] = self._position_ns
            return True
        if q.type == QueryType.DURATION:
            for e in self._order:
                if isinstance(e, SourceElement) and e.query(q):
                    return True
            return False
        if q.type == QueryType.LATENCY:
            # gst_bin_query LATENCY: max of source min-latencies, plus the
            # batch window (a batch must fill before the program runs —
            # the batching analog of queue latency)
            live, mn, mx = False, 0, -1
            for e in self._order:
                if isinstance(e, SourceElement):
                    sq = type(q)(q.type)
                    if e.query(sq):
                        live = live or sq.result.get("live", False)
                        mn = max(mn, sq.result.get("min-latency", 0))
            batch_ns = 0
            for e in self._order:
                if isinstance(e, SourceElement):
                    for sp in e.src_pads():
                        if sp.caps is None:
                            continue
                        s = sp.caps[0] if len(sp.caps) else None
                        fr = s.get("framerate") if s is not None else None
                        if fr is not None and getattr(fr, "num", 0):
                            batch_ns = max(batch_ns, int(
                                self._batch * 1e9 * fr.denom / fr.num))
            q.result.update({"live": live, "min-latency": mn + batch_ns,
                             "max-latency": mx})
            return True
        if q.type == QueryType.SEEKING:
            for e in self._order:
                if isinstance(e, SourceElement):
                    return e.query(q)
            return False
        if q.type == QueryType.ALLOCATION:
            # the buffer-pool analog (gstbufferpool.c:125): staging is
            # device arrays; donation recycles their HBM into outputs
            q.result.update({
                "device-staging": True,
                "donate-inputs": getattr(self, "_donate", False),
                "prefetch": self._prefetch,
                "batch": self._batch,
            })
            return True
        # fall back to sink-side upstream walk
        for e in self._order:
            if isinstance(e, SinkElement) and e.query(q):
                return True
        return False

    def query_position(self) -> Optional[int]:
        from .query import position_query
        q = position_query()
        return q.result.get("position") if self.query(q) else None

    def query_duration(self) -> Optional[int]:
        from .query import duration_query
        q = duration_query()
        return q.result.get("duration") if self.query(q) else None

    def query_latency(self):
        from .query import latency_query
        q = latency_query()
        return q.result if self.query(q) else None


class NegotiationError(Exception):
    pass


def make_pipeline(*factories: str) -> Pipeline:
    """Convenience: build a linear pipeline from factory names."""
    p = Pipeline()
    elems = [element_factory_make(f) for f in factories]
    p.add(*elems)
    for a, b in zip(elems, elems[1:]):
        link(a, b)
    return p
