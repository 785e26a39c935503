"""llama-server lifecycle management (L6).

The reference spawns one llama-server per executor host and keeps it
alive across jobs keyed on the current model, with readiness decided by
the /health endpoint — not by the process being alive — startup failures
classified from the captured log, and shutdown escalating terminate →
kill (webapp/llm_processing/routes.py:672-863). This module is the
Spark-side recast: a per-process `ServerManager` meant to be held as a
lazy executor singleton next to the HttpBackend (operators/extraction
`_get_backend`), so a 1000-executor job runs one server per host, health
gated before the first Arrow batch flows.

Everything is stdlib (urllib, subprocess) and fully mockable — the test
suite (tests/test_server_lifecycle.py) ports the reference's pinned flag
and lifecycle tables (webapp/llm_processing/tests/test_server_command.py
and test_server_lifecycle.py) without needing a binary or a model.
"""

from __future__ import annotations

import json
import os
import subprocess
import tempfile
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class ServerConfig:
    """llama-server launch parameters (reference CancellableJob ctor args,
    webapp/llm_processing/routes.py:672-710)."""

    server_path: str = "/app/llama-server"
    model_path: str = "/models"
    model_name: str = "model.gguf"
    # Hugging Face loading (-hf) instead of a local --model path
    hf_repo: str | None = None
    hf_quant: str | None = None
    hf_file: str | None = None
    hf_token: str | None = None
    ctx_size: int = 4096
    n_gpu_layers: int = 99
    port: int = 2929
    parallel_slots: int = 1
    seed: int = 42
    verbose: bool = False
    mlock: bool = False
    kv_cache_type: str = ""
    gpu: str = "all"
    flash_attention: bool = False
    server_startup_timeout: float = 600.0
    shutdown_timeout: float = 10.0
    health_poll_interval: float = 2.0
    extra_args: list[str] = field(default_factory=list)


def build_server_command(
    cfg: ServerConfig, model_path: Path | None = None
) -> list[str]:
    """Build the llama-server CLI argument list (reference
    build_server_command, webapp/llm_processing/routes.py:672-710).

    Kept as a pure function so the generated arguments can be validated
    against the pinned llama-server --help flag table in tests. Loads the
    model from a local file (model_path) or, when hf_repo is set,
    directly from Hugging Face via -hf.
    """
    command = [cfg.server_path]
    if cfg.hf_repo:
        repo = cfg.hf_repo
        # append the quant as repo:QUANT unless the repo already has one
        if cfg.hf_quant and ":" not in repo:
            repo = f"{repo}:{cfg.hf_quant}"
        command += ["-hf", repo]
        if cfg.hf_file:
            command += ["-hff", cfg.hf_file]
        if cfg.hf_token:
            command += ["-hft", cfg.hf_token]
    else:
        command += ["--model", str(model_path)]
    command += [
        "--ctx-size", str(cfg.ctx_size),
        "--n-gpu-layers", str(cfg.n_gpu_layers),
        "--port", str(cfg.port),
        "--metrics",
        "-np", str(cfg.parallel_slots),
        "-b", "2048",
        "-ub", "512",
        "-t", "8",
        "--seed", str(cfg.seed),
    ]
    command += ["--verbose"] if cfg.verbose else []
    command += ["--mlock"] if cfg.mlock else []
    if cfg.kv_cache_type != "":
        command += ["-ctk", cfg.kv_cache_type, "-ctv", cfg.kv_cache_type]
    if cfg.gpu not in ("all", "ALL", "mps", "", "row"):
        command += ["-sm", "none", "-mg", str(cfg.gpu)]
    if cfg.gpu == "row":
        command += ["-sm", "row"]
    # llama.cpp b10068+ requires -fa/--flash-attn to take a value
    # (on/off/auto); a bare "-fa" makes the server exit with
    # "expected value for argument".
    command += ["-fa", "on"] if cfg.flash_attention else []
    command += list(cfg.extra_args)
    return command


def classify_startup_failure(log_text: str) -> str:
    """Best-effort classification of why llama-server failed to start
    (reference _classify_startup_failure): out-of-memory / model-loading /
    generic startup."""
    lowered = (log_text or "").lower()
    if any(
        marker in lowered
        for marker in (
            "out of memory", "cudamalloc", "failed to allocate",
            "insufficient memory", "oom",
        )
    ):
        return "out-of-memory"
    if any(
        marker in lowered
        for marker in (
            "failed to load model", "error loading model", "no such file",
            "gguf",
        )
    ):
        return "model-loading"
    return "startup"


def shutdown_server(
    proc: subprocess.Popen, timeout: float = 10.0
) -> None:
    """Terminate a llama-server child cleanly, escalating to kill if it
    ignores SIGTERM (reference _shutdown_server)."""
    if proc.poll() is not None:
        return
    try:
        proc.terminate()
        proc.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        try:
            proc.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            pass


class ServerStartupError(RuntimeError):
    """Raised when llama-server dies or never becomes healthy; carries the
    classified cause and the captured log tail."""

    def __init__(self, message: str, cause: str, log_tail: str):
        super().__init__(message)
        self.cause = cause
        self.log_tail = log_tail


class ServerManager:
    """One llama-server per process, kept alive across jobs keyed on the
    model name (reference start_server + current_model global,
    routes.py:806-863 — recast as instance state so tests and executors
    can hold independent managers)."""

    def __init__(self, cfg: ServerConfig):
        self.cfg = cfg
        self.proc: subprocess.Popen | None = None
        self.current_model: str | None = None
        self._server_log = None
        self._canceled = False

    # -- log capture ---------------------------------------------------------

    def read_server_log(self, max_chars: int = 4000) -> str:
        """Tail of the captured startup log (reference _read_server_log)."""
        log_file = self._server_log
        if log_file is None:
            return ""
        try:
            log_file.flush()
        except (ValueError, OSError):
            pass
        try:
            with open(log_file.name, errors="replace") as f:
                return f.read()[-max_chars:]
        except OSError:
            return ""

    # -- readiness -----------------------------------------------------------

    def _health_ok(self) -> bool:
        url = f"http://localhost:{self.cfg.port}/health"
        try:
            with urllib.request.urlopen(url, timeout=5) as r:
                if r.status != 200:
                    return False  # 503 while loading — keep polling
                return json.loads(r.read()).get("status") == "ok"
        except (urllib.error.URLError, OSError, ValueError):
            return False  # not listening yet

    def cancel(self) -> None:
        """Abort a pending startup wait (reference CancellableJob._canceled):
        await_server_ready raises instead of returning, so a canceled
        launch is never mistaken for a healthy one."""
        self._canceled = True

    def await_server_ready(self, proc: subprocess.Popen) -> None:
        """Poll /health with a bounded timeout (reference
        _await_server_ready). A live process is NOT 'ready' — readiness
        requires status == ok. Raises ServerStartupError with the
        classified cause + log tail when the child dies, times out, or
        the wait is canceled."""
        deadline = time.monotonic() + self.cfg.server_startup_timeout
        while not self._canceled:
            exit_code = proc.poll()
            if exit_code is not None:
                log_text = self.read_server_log()
                cause = classify_startup_failure(log_text)
                raise ServerStartupError(
                    f"llama-server exited during startup (exit code "
                    f"{exit_code}, cause: {cause}).\nStartup log tail:\n"
                    f"{log_text}",
                    cause,
                    log_text,
                )
            if time.monotonic() > deadline:
                log_text = self.read_server_log()
                shutdown_server(proc, self.cfg.shutdown_timeout)
                raise ServerStartupError(
                    f"llama-server did not become ready within "
                    f"{self.cfg.server_startup_timeout}s.\nStartup log "
                    f"tail:\n{log_text}",
                    "timeout",
                    log_text,
                )
            if self._health_ok():
                return
            time.sleep(self.cfg.health_poll_interval)
        # loop exited via cancel(): the child may still be starting — shut it
        # down and surface the cancellation as a startup failure, never as
        # readiness (reference CancellableJob: a canceled job must not run).
        log_text = self.read_server_log()
        shutdown_server(proc, self.cfg.shutdown_timeout)
        raise ServerStartupError(
            "llama-server startup wait canceled.\nStartup log tail:\n"
            f"{log_text}",
            "canceled",
            log_text,
        )

    # -- lifecycle -----------------------------------------------------------

    def _model_key(self) -> str:
        """Identity of the model the current config would launch. For HF
        loading the launch command carries hf_repo/hf_file/hf_quant and
        model_name is irrelevant — keying reuse on model_name alone would
        silently keep serving the OLD repo after cfg.hf_repo changes."""
        if self.cfg.hf_repo:
            return f"hf:{self.cfg.hf_repo}:{self.cfg.hf_file or self.cfg.hf_quant or ''}"
        return f"local:{self.cfg.model_name}"

    def _replace_server_log(self) -> None:
        """Open a fresh startup-log capture, closing and unlinking the
        previous one (a long-lived executor that swaps models or retries
        failed startups must not leak an fd + /tmp file per launch)."""
        old = self._server_log
        self._server_log = tempfile.NamedTemporaryFile(
            mode="w+", prefix="llama_server_", suffix=".log", delete=False
        )
        if old is not None:
            try:
                old.close()
                os.unlink(old.name)
            except OSError:
                pass

    def start_server(self) -> None:
        """Spawn (or reuse) the server for the configured model. On
        startup failure the child is shut down and the model state reset
        so a subsequent attempt re-launches instead of assuming the dead
        process is ready (reference start_server, routes.py:806-863)."""
        # a new launch is a new cancellable wait — a cancel() from a
        # previous job must not poison every future startup
        self._canceled = False
        if self.cfg.hf_repo:
            # Hugging Face model: llama-server downloads via -hf
            model_path = None
        else:
            model_dir = Path(self.cfg.model_path)
            model_path = model_dir / self.cfg.model_name
            if model_path.absolute().parent != model_dir.absolute():
                raise ValueError(
                    f"model_name escapes model_path: {self.cfg.model_name!r}"
                )

        model_key = self._model_key()
        if self.current_model == model_key and self.proc is not None:
            if self.proc.poll() is None:
                return  # same model, still alive
        if self.proc is not None:
            shutdown_server(self.proc, self.cfg.shutdown_timeout)

        command = build_server_command(self.cfg, model_path)
        # capture startup logs so failures can be reported with evidence
        self._replace_server_log()
        self.proc = subprocess.Popen(
            command, stdout=self._server_log, stderr=subprocess.STDOUT
        )
        self.current_model = model_key
        try:
            self.await_server_ready(self.proc)
        except Exception:
            shutdown_server(self.proc, self.cfg.shutdown_timeout)
            self.current_model = None
            raise

    def stop(self) -> None:
        if self.proc is not None:
            shutdown_server(self.proc, self.cfg.shutdown_timeout)
            self.proc = None
            self.current_model = None
        # release the FINAL startup-log capture too — _replace_server_log
        # only cleans the previous one on the next launch, so without
        # this a stopped manager leaks one fd + /tmp file for its
        # lifetime
        log = self._server_log
        self._server_log = None
        if log is not None:
            try:
                log.close()
                os.unlink(log.name)
            except OSError:
                pass
