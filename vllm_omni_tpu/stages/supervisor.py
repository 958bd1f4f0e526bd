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
