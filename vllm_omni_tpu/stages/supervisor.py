"""Stage-host supervision: spawn, health-check, restart.

Parity role: the reference gets stage placement + lifecycle from Ray —
placement groups, actor start/kill, restart-on-crash
(reference distributed/ray_utils/utils.py:28-169). TPU-first mapping:
no Ray. A stage with `runtime.remote: "auto"` (or "auto:cpu" to force a
JAX platform) gets a supervised stage-host SUBPROCESS
(`python -m vllm_omni_tpu.stages.remote`): the supervisor launches it
from the stage config, watches liveness (process poll + protocol
ping/pong driven by RemoteStage), and respawns it on crash; RemoteStage
then reconnects and re-submits its in-flight requests.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
from typing import Optional

from vllm_omni_tpu.config.stage import StageConfig
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class StageHostSupervisor:
    """Owns one stage-host subprocess for a stage config."""

    def __init__(self, config: StageConfig, platform: str = "",
                 max_restarts: int = 3, ready_timeout: float = 300.0):
        self.config = config
        self.platform = platform
        self.max_restarts = max_restarts
        self.ready_timeout = ready_timeout
        self.restarts = 0
        self.proc: Optional[subprocess.Popen] = None
        self._cfg_path: Optional[str] = None
        self._lock = threading.Lock()

    # ------------------------------------------------------------ spawn
    def start(self) -> str:
        """Spawn the stage host; returns its "127.0.0.1:<port>"."""
        with self._lock:
            return self._spawn()

    def _spawn(self) -> str:
        if self._cfg_path is None:
            fd, self._cfg_path = tempfile.mkstemp(
                prefix=f"omni_stage{self.config.stage_id}_", suffix=".json")
            with os.fdopen(fd, "w") as f:
                json.dump(self.config.to_dict(), f)
        cmd = [sys.executable, "-m", "vllm_omni_tpu.stages.remote",
               "--config", self._cfg_path, "--port", "0",
               "--host", "127.0.0.1"]
        if self.platform:
            cmd += ["--platform", self.platform]
        env = dict(os.environ)
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        self.proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            env=env, cwd=repo, text=True)
        deadline = time.monotonic() + self.ready_timeout
        while time.monotonic() < deadline:
            line = self.proc.stdout.readline()
            if line.startswith("STAGE_READY"):
                port = int(line.split()[1])
                logger.info("stage %d host up (pid %d, port %d)",
                            self.config.stage_id, self.proc.pid, port)
                return f"127.0.0.1:{port}"
            if self.proc.poll() is not None:
                raise RuntimeError(
                    f"stage {self.config.stage_id} host died during "
                    f"startup rc={self.proc.returncode}")
        self.proc.kill()
        raise TimeoutError(
            f"stage {self.config.stage_id} host not ready after "
            f"{self.ready_timeout}s")

    # ----------------------------------------------------------- health
    def alive(self) -> bool:
        p = self.proc
        return p is not None and p.poll() is None

    def kill(self) -> None:
        """Force-kill the current host (used when it is wedged: alive
        but not answering pings)."""
        p = self.proc
        if p is not None and p.poll() is None:
            p.kill()
            p.wait(timeout=10)

    def restart(self) -> str:
        """Respawn after a crash; returns the new address. Raises after
        max_restarts (the failure then surfaces to the requests)."""
        with self._lock:
            if self.restarts >= self.max_restarts:
                raise RuntimeError(
                    f"stage {self.config.stage_id} host exceeded "
                    f"{self.max_restarts} restarts")
            self.restarts += 1
            if self.proc is not None and self.proc.poll() is None:
                self.proc.kill()
                self.proc.wait(timeout=10)
            logger.warning("restarting stage %d host (attempt %d/%d)",
                           self.config.stage_id, self.restarts,
                           self.max_restarts)
            return self._spawn()

    def stop(self) -> None:
        p = self.proc
        if p is not None:
            p.terminate()
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        if self._cfg_path and os.path.isfile(self._cfg_path):
            try:
                os.unlink(self._cfg_path)
            except OSError:
                pass


class RemoteHostSupervisor:
    """Supervises a stage host at a FIXED address (another machine, or
    a process launched outside this orchestrator) — the cross-host half
    of the reference's Ray actor lifecycle (ray_utils/utils.py:28-169).

    There is no process handle: liveness is protocol-level (RemoteStage
    pings; its reader detects the dead socket) and recovery is
    (1) optionally firing `relaunch_cmd` — a shell template with
    {host} {port} {config} placeholders, e.g. an ssh line — then
    (2) waiting for the address to accept connections again. Without a
    relaunch command, restart() just waits out `ready_timeout` for
    external recovery (a pod scheduler restarting the host)."""

    def __init__(self, config: StageConfig, address: str,
                 relaunch_cmd: str = "", max_restarts: int = 3,
                 ready_timeout: float = 120.0):
        self.config = config
        self.address = address
        self.relaunch_cmd = relaunch_cmd
        self.max_restarts = max_restarts
        self.ready_timeout = ready_timeout
        self.restarts = 0
        self._cfg_path: Optional[str] = None
        self._lock = threading.Lock()

    def start(self) -> str:
        return self.address

    def ensure_launched(self) -> str:
        """First launch (placement path): when the address is down and a
        launch template exists, fire it and wait for the host to come
        up. Does not count against max_restarts — this is bring-up, not
        failure recovery (the reference gets this from Ray actor start,
        ray_utils/utils.py:28-109)."""
        if self.alive() or not self.relaunch_cmd:
            return self.address
        host, _, port = self.address.rpartition(":")
        cmd = self.relaunch_cmd.format(
            host=host or "127.0.0.1", port=port,
            config=self._config_path())
        logger.info("launching stage %d host at %s: %s",
                    self.config.stage_id, self.address, cmd)
        subprocess.Popen(cmd, shell=True, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
        self._wait_reachable()
        return self.address

    def _config_path(self) -> str:
        if self._cfg_path is None:
            fd, self._cfg_path = tempfile.mkstemp(
                prefix=f"omni_stage{self.config.stage_id}_", suffix=".json")
            with os.fdopen(fd, "w") as f:
                json.dump(self.config.to_dict(), f)
        return self._cfg_path

    def _wait_reachable(self) -> None:
        import socket

        host, _, port = self.address.rpartition(":")
        deadline = time.monotonic() + self.ready_timeout
        while True:
            try:
                with socket.create_connection(
                        (host or "127.0.0.1", int(port)), timeout=2):
                    return
            except OSError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"stage {self.config.stage_id} host at "
                        f"{self.address} not back after "
                        f"{self.ready_timeout}s")
                time.sleep(0.3)

    def alive(self) -> bool:
        """Reachability probe (protocol liveness is the pings)."""
        import socket

        host, _, port = self.address.rpartition(":")
        try:
            with socket.create_connection(
                    (host or "127.0.0.1", int(port)), timeout=2):
                return True
        except OSError:
            return False

    def restart(self) -> str:
        """Mark down -> optionally relaunch -> wait reachable. Raises
        after max_restarts (failures then surface per request)."""
        with self._lock:
            if self.restarts >= self.max_restarts:
                raise RuntimeError(
                    f"stage {self.config.stage_id} remote host exceeded "
                    f"{self.max_restarts} restarts")
            self.restarts += 1
            host, _, port = self.address.rpartition(":")
            if self.relaunch_cmd:
                cmd = self.relaunch_cmd.format(
                    host=host or "127.0.0.1", port=port,
                    config=self._config_path())
                logger.warning(
                    "relaunching stage %d remote host (attempt %d/%d): %s",
                    self.config.stage_id, self.restarts,
                    self.max_restarts, cmd)
                subprocess.Popen(cmd, shell=True,
                                 stdout=subprocess.DEVNULL,
                                 stderr=subprocess.DEVNULL)
            else:
                logger.warning(
                    "stage %d remote host at %s down; waiting for "
                    "external recovery (attempt %d/%d)",
                    self.config.stage_id, self.address, self.restarts,
                    self.max_restarts)
            self._wait_reachable()
            return self.address

    def kill(self) -> None:
        """No process handle — nothing to kill; the wedged host is
        abandoned (the relaunch command owns replacement)."""

    def stop(self) -> None:
        if self._cfg_path and os.path.isfile(self._cfg_path):
            try:
                os.unlink(self._cfg_path)
            except OSError:
                pass
