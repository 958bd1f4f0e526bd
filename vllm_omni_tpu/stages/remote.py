"""Remote (multi-host) stages: run a stage in another process/host.

Parity role: the reference's Ray execution backend places stage workers
on other hosts via placement groups + ray queues (reference
distributed/ray_utils/utils.py:28-169, --worker-backend ray). TPU-first
mapping: no Ray — a stage host is a plain process started with
`python -m vllm_omni_tpu.stages.remote --config <json> --port N`
(one per host, e.g. under a pod scheduler), and the orchestrator drives
it through a length-prefixed socket protocol carrying the same
StageTask/StageOutput payloads (connector serialization: jax arrays ->
numpy over the wire). Large inter-stage payloads can additionally ride
the TCP blob connector (connectors/tcp.py, the DCN/Mooncake stand-in);
control stays on this channel.

Orchestrator side: set `runtime.remote: "host:port"` on a stage config
and Omni/AsyncOmni builds a `RemoteStage` proxy instead of a local
engine — the rest of the DAG (input processors, forwarding, final
output collection) is unchanged.
"""

from __future__ import annotations

import argparse
import json
import queue
import socket
import struct
import threading
import time
from typing import Any, Optional

from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.connectors.serialization import deserialize, serialize
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.sampling_params import SamplingParams
from vllm_omni_tpu.stages.omni_stage import OmniStage, StageOutput, StageTask
from vllm_omni_tpu.utils.metrics import StageRequestMetrics

logger = init_logger(__name__)


def _send(sock: socket.socket, obj: Any) -> None:
    payload = serialize(obj)
    sock.sendall(struct.pack(">Q", len(payload)) + payload)


def _recv(sock: socket.socket) -> Any:
    hdr = b""
    while len(hdr) < 8:
        chunk = sock.recv(8 - len(hdr))
        if not chunk:
            raise ConnectionError("socket closed")
        hdr += chunk
    (n,) = struct.unpack(">Q", hdr)
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("socket closed mid-message")
        buf.extend(chunk)
    return deserialize(bytes(buf))


class RemoteStage(OmniStage):
    """Orchestrator-side proxy with the OmniStage surface; the engine
    lives in the stage-host process at `config.runtime.remote`.

    `runtime.remote: "auto"` (or "auto:cpu") spawns a SUPERVISED
    stage-host subprocess (stages/supervisor.py): on crash the host is
    respawned, the proxy reconnects and re-submits its in-flight
    requests — the reference's Ray actor restart intent
    (ray_utils/utils.py:28-169) without Ray."""

    _closing = False

    def init_stage_worker(self) -> None:
        addr = getattr(self.config.runtime, "remote", "")
        self._supervisor = None
        self._sock_lock = threading.Lock()
        self._recover_lock = threading.Lock()
        self._last_pong = time.monotonic()
        # tasks submitted but not finally answered: re-sent on recovery
        self._inflight: dict[str, StageTask] = {}
        try:
            if addr == "auto" or addr.startswith("auto:"):
                from vllm_omni_tpu.stages.supervisor import (
                    StageHostSupervisor,
                )

                platform = addr.partition(":")[2]
                self._supervisor = StageHostSupervisor(
                    self.config, platform=platform)
                addr = self._supervisor.start()
            else:
                # fixed host:port — supervise the ADDRESS: ping-driven
                # mark-down + reconnect, optional relaunch command
                # (reference Ray cross-host placement + actor restart,
                # ray_utils/utils.py:28-169)
                from vllm_omni_tpu.stages.supervisor import (
                    RemoteHostSupervisor,
                )

                self._supervisor = RemoteHostSupervisor(
                    self.config, addr,
                    relaunch_cmd=getattr(
                        self.config.runtime, "relaunch_cmd", ""))
                # placement path: a planned host may not be running yet —
                # first launch rides the same template as recovery
                self._supervisor.ensure_launched()
            self._connect(addr)
        except BaseException as e:
            self.init_error = e
            self.ready.set()
            return
        th = threading.Thread(target=self._reader, daemon=True,
                              name=f"remote-stage-{self.stage_id}")
        self._threads.append(th)
        th.start()
        interval = float(getattr(self.config.runtime, "ping_interval", 0.0))
        if interval > 0:
            wd = threading.Thread(target=self._watchdog, daemon=True,
                                  name=f"remote-stage-{self.stage_id}-wd")
            self._threads.append(wd)
            wd.start()
        self.ready.set()

    def _connect(self, addr: str) -> None:
        host, _, port = addr.rpartition(":")
        deadline = time.monotonic() + 120
        while True:
            try:
                sock = socket.create_connection(
                    (host or "127.0.0.1", int(port)), timeout=5)
                # the hello handshake is part of the retry loop: a
                # SIGKILLed host's listener can briefly accept-then-RST
                # during kernel teardown, so an established connection
                # does not yet prove a live host
                hello = _recv(sock)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.2)
        if hello.get("type") != "ready":
            raise RuntimeError(f"stage host not ready: {hello}")
        self._sock = sock
        self._last_pong = time.monotonic()

    def _watchdog(self) -> None:
        """Wedged-host detection: ping on a cadence; a missing pong past
        ping_timeout marks the host down by closing our socket end —
        the reader's recv fails and drives the normal recovery path
        (kill+respawn for supervised subprocesses, relaunch/wait for
        remote addresses)."""
        interval = float(self.config.runtime.ping_interval)
        timeout = float(self.config.runtime.ping_timeout)
        while not self._closing:
            time.sleep(interval)
            if self._closing:
                return
            sock = getattr(self, "_sock", None)
            self.ping()
            if time.monotonic() - self._last_pong <= timeout:
                continue
            logger.warning(
                "stage %d host unresponsive for %.0fs; marking down",
                self.stage_id, timeout)
            sup = self._supervisor
            if sup is not None:
                sup.kill()  # wedged local subprocess; no-op for remote
            try:
                if sock is not None:
                    sock.close()  # the exact socket we pinged — never a
                    # fresh one that recovery opened meanwhile
            except OSError:
                pass
            # give recovery a full window before re-judging
            self._last_pong = time.monotonic()

    # ------------------------------------------------- incremental edges
    # Cross-stage streaming ONTO a remote consumer: the configured
    # StreamInputProcessor runs on the HOST (it needs the consumer
    # engine), and the orchestrator relays upstream partial/final
    # StageOutputs as edge_* messages. Device arrays are host-fetched at
    # serialization time on this sender thread — never on the
    # orchestrator's single output-handler thread (the round-3 defect:
    # one ~20-30 ms device roundtrip per token there serialized the
    # whole DAG). See RemoteEdgeStreamProxy.

    def _ensure_edge_sender(self) -> None:
        if getattr(self, "_edge_q", None) is None:
            self._edge_q: "queue.Queue[Optional[dict]]" = queue.Queue()
            self._edge_rids: set[str] = set()
            th = threading.Thread(
                target=self._edge_sender, daemon=True,
                name=f"remote-stage-{self.stage_id}-edge")
            self._threads.append(th)
            th.start()

    def edge_begin(self, request_id: str, prompt: Any, sp, stream: bool,
                   src: int) -> None:
        self._ensure_edge_sender()
        self._edge_rids.add(request_id)
        self._edge_q.put({
            "type": "edge_begin", "request_id": request_id,
            "prompt": prompt, "src": src,
            "sampling_params": sp.__dict__ if sp is not None else None,
            "stream": stream,
        })

    def edge_event(self, kind: str, request_id: str, src: int,
                   output: Any) -> None:
        self._edge_q.put({"type": kind, "request_id": request_id,
                          "src": src, "output": output})
        if kind == "edge_final":
            self._edge_rids.discard(request_id)

    def edge_cancel(self, request_id: str) -> None:
        if getattr(self, "_edge_q", None) is None:
            return
        self._edge_rids.discard(request_id)
        self._edge_q.put({"type": "edge_cancel", "request_id": request_id})

    def _edge_sender(self) -> None:
        while True:
            msg = self._edge_q.get()
            if msg is None or self._closing:
                return
            try:
                with self._sock_lock:
                    _send(self._sock, msg)
            except (ConnectionError, OSError):
                # a fresh host has no processor state for this stream:
                # recovery fails the edge request instead of replaying
                self.out_q.put(StageOutput(
                    request_id=msg.get("request_id", ""),
                    stage_id=self.stage_id,
                    error="remote stage connection lost mid-stream"))
                self._edge_rids.discard(msg.get("request_id", ""))
                if not self._recover():
                    return

    def _fail_edge_streams(self, reason: str) -> None:
        for rid in list(getattr(self, "_edge_rids", ()) or ()):
            self._edge_rids.discard(rid)
            self.out_q.put(StageOutput(
                request_id=rid, stage_id=self.stage_id, error=reason))

    def _task_msg(self, task: StageTask) -> dict:
        sp = task.sampling_params
        return {
            "type": "task",
            "request_id": task.request_id,
            "prompt": task.prompt,
            "sampling_params": sp.__dict__ if sp is not None else None,
            "diffusion_kwargs": task.diffusion_kwargs,
            "stream": task.stream,
        }

    def submit(self, task: StageTask) -> None:
        self._inflight[task.request_id] = task
        try:
            with self._sock_lock:
                _send(self._sock, self._task_msg(task))
        except (ConnectionError, OSError):
            if not self._recover():
                raise

    def abort(self, request_id: str) -> None:
        """Propagate the abort to the stage-host process."""
        self._inflight.pop(request_id, None)
        try:
            with self._sock_lock:
                _send(self._sock, {"type": "abort",
                                   "request_id": request_id})
        except (OSError, AttributeError):
            pass

    def ping(self, timeout: float = 5.0) -> bool:
        """Health check over the protocol (answered between tasks by the
        host's control loop; the pong arrives on the reader)."""
        try:
            with self._sock_lock:
                _send(self._sock, {"type": "ping"})
            return True
        except (ConnectionError, OSError):
            return False

    def _reader(self) -> None:
        while True:
            try:
                msg = _recv(self._sock)
            except (ConnectionError, OSError):
                if self._closing:
                    return
                logger.warning("remote stage %d connection lost",
                               self.stage_id)
                if not self._recover():
                    return
                continue
            if msg.get("type") == "pong":
                self._last_pong = time.monotonic()
                continue
            if msg.get("type") != "result":
                continue
            m = None
            if msg.get("metrics"):
                m = StageRequestMetrics(**msg["metrics"])
            if not msg.get("partial"):
                self._inflight.pop(msg["request_id"], None)
            self.out_q.put(StageOutput(
                request_id=msg["request_id"], stage_id=self.stage_id,
                output=msg.get("output"), metrics=m,
                error=msg.get("error"),
                partial=bool(msg.get("partial")),
            ))

    def _recover(self) -> bool:
        """Respawn (supervised hosts only), reconnect, re-submit every
        in-flight request. Returns False when recovery is impossible —
        pending requests then surface as per-request errors."""
        if self._supervisor is None or self._closing:
            self._fail_inflight("remote stage connection lost")
            return False
        entry_epoch = getattr(self, "_epoch", 0)
        with self._recover_lock:
            if getattr(self, "_epoch", 0) != entry_epoch:
                # another thread (reader vs submit vs watchdog) already
                # recovered while we waited on the lock — a second
                # restart would kill the fresh host
                return True
            while True:  # restart budget bounds this loop
                try:
                    addr = self._supervisor.restart()
                    self._connect(addr)
                    self._epoch = getattr(self, "_epoch", 0) + 1
                except BaseException as e:
                    logger.error("stage %d host recovery failed: %s",
                                 self.stage_id, e)
                    self._fail_inflight(f"stage host recovery failed: {e}")
                    return False
                # edge-streamed requests cannot replay (the dead host
                # held the processor/feed state): fail them now so the
                # client sees an error instead of a hang
                self._fail_edge_streams(
                    "stage host died mid-stream (processor state lost)")
                pending = list(self._inflight.values())
                logger.info("stage %d host recovered; re-submitting %d "
                            "in-flight requests", self.stage_id,
                            len(pending))
                resubmit_ok = True
                for task in pending:
                    try:
                        with self._sock_lock:
                            _send(self._sock, self._task_msg(task))
                    except (ConnectionError, OSError):
                        resubmit_ok = False  # fresh host died already:
                        break  # go around (bounded by max_restarts)
                if resubmit_ok:
                    return True

    def _fail_inflight(self, reason: str) -> None:
        self._fail_edge_streams(reason)
        for rid in list(self._inflight):
            self._inflight.pop(rid, None)
            self.out_q.put(StageOutput(
                request_id=rid, stage_id=self.stage_id, error=reason))

    def shutdown(self) -> None:
        self._closing = True
        if getattr(self, "_edge_q", None) is not None:
            self._edge_q.put(None)
        try:
            with self._sock_lock:
                _send(self._sock, {"type": "stop"})
            self._sock.close()
        except Exception:
            pass
        if self._supervisor is not None:
            self._supervisor.stop()


class RemoteEdgeStreamProxy:
    """Orchestrator-side stand-in for a StreamInputProcessor whose
    consumer stage is remote (stages/streaming.py disengaged these
    edges before round 5: "live feed objects cannot cross a socket").

    The real processor runs on the stage HOST against the local engine;
    this proxy relays upstream partial/final StageOutputs over the
    control socket (edge_* messages, serialized by the connector codec —
    device arrays become numpy at the boundary, fetched on the edge
    sender thread). It always returns None: submission happens host-side
    when the processor produces the consumer prompt, and results flow
    back through the normal result pump."""

    needs_upstream_stream = True

    def __init__(self, stage: "RemoteStage", request_id: str,
                 original_prompt: Any, sp, stream: bool, src: int):
        self.stage = stage
        self.request_id = request_id
        self.original_prompt = original_prompt
        self.sp = sp
        self.stream = stream
        self.src = src
        self.submitted = False  # host owns submission
        self._begun = False

    def _ensure_begin(self) -> None:
        if not self._begun:
            self._begun = True
            self.stage.edge_begin(self.request_id, self.original_prompt,
                                  self.sp, self.stream, self.src)

    def on_partial(self, src_stage_id: int, output) -> None:
        self._ensure_begin()
        self.stage.edge_event("edge_partial", self.request_id,
                              src_stage_id, output)
        return None

    def on_final(self, src_stage_id: int, output) -> None:
        self._ensure_begin()
        self.stage.edge_event("edge_final", self.request_id,
                              src_stage_id, output)
        return None

    def cancel(self) -> None:
        if self._begun:
            self.stage.edge_cancel(self.request_id)


def serve_stage(cfg: StageConfig, port: int, host: str = "0.0.0.0") -> None:
    """Stage-host body: build the local stage, serve orchestrator
    connections (successively — a reconnect after a transient network
    drop reuses the live engine instead of requiring a relaunch), pump
    tasks in and results out until `stop`."""
    out_q: "queue.Queue[StageOutput]" = queue.Queue()
    stage = OmniStage(cfg, out_q)
    stage.init_stage_worker()
    stage.wait_ready()

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    logger.info("stage %d serving on %s:%d", cfg.stage_id, host,
                srv.getsockname()[1])
    print(f"STAGE_READY {srv.getsockname()[1]}", flush=True)
    stop_all = False
    try:
        while not stop_all:
            conn, peer = srv.accept()
            logger.info("orchestrator connected from %s", peer)
            send_lock = threading.Lock()
            _send(conn, {"type": "ready", "stage_id": cfg.stage_id})

            stop = threading.Event()

            def pump_results(conn=conn, send_lock=send_lock, stop=stop):
                while not stop.is_set():
                    try:
                        so = out_q.get(timeout=0.2)
                    except queue.Empty:
                        continue
                    m = None
                    if so.metrics is not None:
                        m = {k: getattr(so.metrics, k)
                             for k in so.metrics.__dataclass_fields__}
                    try:
                        with send_lock:
                            _send(conn, {
                                "type": "result",
                                "request_id": so.request_id,
                                "output": so.output, "metrics": m,
                                "error": so.error, "partial": so.partial,
                            })
                    except (ConnectionError, OSError):
                        # keep the result for the next connection
                        out_q.put(so)
                        return

            pump = threading.Thread(target=pump_results, daemon=True)
            pump.start()
            # incremental remote edges (RemoteEdgeStreamProxy): the
            # configured StreamInputProcessor runs HERE against the
            # local engine; request_id -> (processor, sp, stream)
            edge_procs: dict[str, tuple[Any, Any, bool]] = {}

            def edge_error(rid: str, e: BaseException) -> None:
                import traceback

                logger.error("edge stream processor failed on %s: %s",
                             rid, e)
                try:
                    with send_lock:
                        _send(conn, {
                            "type": "result", "request_id": rid,
                            "output": None, "metrics": None,
                            "error": (f"edge stream processor: {e}\n"
                                      f"{traceback.format_exc()}"),
                            "partial": False,
                        })
                except (ConnectionError, OSError):
                    pass

            try:
                while True:
                    msg = _recv(conn)
                    if msg.get("type") == "stop":
                        stop_all = True
                        break
                    if msg.get("type") == "ping":
                        with send_lock:
                            _send(conn, {"type": "pong"})
                        continue
                    if msg.get("type") == "abort":
                        stage.abort(msg.get("request_id", ""))
                        continue
                    mtype = msg.get("type")
                    if mtype == "edge_begin":
                        rid = msg["request_id"]
                        try:
                            cls = cfg.resolve_stream_input_processor()
                            assert cls is not None, (
                                "no stream_input_processor configured")
                            sp_d = msg.get("sampling_params")
                            sp = SamplingParams(**sp_d) if sp_d else None
                            edge_procs[rid] = (
                                cls(stage, msg.get("prompt")), sp,
                                bool(msg.get("stream")))
                        except BaseException as e:
                            edge_error(rid, e)
                        continue
                    if mtype in ("edge_partial", "edge_final"):
                        rid = msg["request_id"]
                        entry = edge_procs.get(rid)
                        if entry is None:
                            continue
                        proc, sp, task_stream = entry
                        try:
                            fn = (proc.on_partial
                                  if mtype == "edge_partial"
                                  else proc.on_final)
                            next_input = fn(msg["src"], msg["output"])
                        except BaseException as e:
                            edge_procs.pop(rid, None)
                            edge_error(rid, e)
                            continue
                        if next_input is not None:
                            proc.submitted = True
                            stage.submit(StageTask(
                                rid, next_input, sp, stream=task_stream))
                        if mtype == "edge_final":
                            edge_procs.pop(rid, None)
                        continue
                    if mtype == "edge_cancel":
                        rid = msg["request_id"]
                        entry = edge_procs.pop(rid, None)
                        if entry is not None:
                            try:
                                entry[0].cancel()
                            except Exception:
                                pass
                        stage.abort(rid)
                        continue
                    if mtype != "task":
                        continue
                    sp = msg.get("sampling_params")
                    stage.submit(StageTask(
                        request_id=msg["request_id"], prompt=msg["prompt"],
                        sampling_params=(SamplingParams(**sp) if sp
                                         else None),
                        diffusion_kwargs=msg.get("diffusion_kwargs"),
                        stream=bool(msg.get("stream")),
                    ))
            except (ConnectionError, OSError):
                logger.warning("orchestrator connection lost; "
                               "re-accepting")
            finally:
                stop.set()
                pump.join(timeout=5)
                conn.close()
    finally:
        stage.shutdown()
        srv.close()


def main() -> None:
    ap = argparse.ArgumentParser(description="vllm-omni-tpu stage host")
    ap.add_argument("--config", required=True,
                    help="path to a JSON-serialized StageConfig dict")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--platform", default="",
                    help="force a JAX platform (e.g. cpu) before init — "
                    "ambient JAX_PLATFORMS can be re-pinned by device "
                    "tunnels, so an env var alone is not reliable")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    with open(args.config) as f:
        d = json.load(f)
    from vllm_omni_tpu.config.stage import stage_config_from_dict

    serve_stage(stage_config_from_dict(d), args.port, args.host)


if __name__ == "__main__":
    main()
