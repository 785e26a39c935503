"""L6 server lifecycle — hermetic tests ported from the reference's
pinned tables (webapp/llm_processing/tests/test_server_command.py:24-114
and test_server_lifecycle.py): flag generation against the known
llama-server --help set, startup-failure classification, log-tail
capture, shutdown escalation, and /health-gated readiness. The server
process and its health endpoint are mocked — no binary or model needed."""

from __future__ import annotations

import subprocess
import tempfile
from pathlib import Path
from unittest import mock

import pytest

from llmaix_spark.operators import server as srv
from llmaix_spark.operators.server import (
    ServerConfig,
    ServerManager,
    ServerStartupError,
    build_server_command,
    classify_startup_failure,
    shutdown_server,
)

MODEL = Path("/models/model.gguf")

# Flags we are allowed to generate, verified against the pinned
# llama.cpp server build (reference test_server_command.py:24-30).
KNOWN_FLAGS = {
    "--model", "--ctx-size", "--n-gpu-layers", "--port", "--metrics",
    "-np", "-b", "-ub", "-t", "--seed", "--verbose", "--mlock",
    "-ctk", "-ctv", "-sm", "-mg", "-fa",
    "-hf", "-hff", "-hft",
}


def flags_in(command):
    return [tok for tok in command if isinstance(tok, str) and tok.startswith("-")]


# --- build_server_command (reference test_server_command.py) ----------------


def test_flash_attention_flag_takes_value():
    # b10068+ requires -fa to be followed by on/off/auto; a bare -fa makes
    # the server exit with "expected value for argument".
    cmd = build_server_command(ServerConfig(flash_attention=True), MODEL)
    assert "-fa" in cmd
    idx = cmd.index("-fa")
    assert idx + 1 < len(cmd), "-fa must not be the trailing argument"
    assert cmd[idx + 1] in {"on", "off", "auto"}


def test_no_flash_attention_flag_when_disabled():
    cmd = build_server_command(ServerConfig(flash_attention=False), MODEL)
    assert "-fa" not in cmd


def test_all_generated_flags_are_known():
    # exercise the flag-producing options together (gpu="0" yields -sm/-mg)
    cmd = build_server_command(
        ServerConfig(
            flash_attention=True, verbose=True, mlock=True,
            kv_cache_type="q8_0", gpu="0",
        ),
        MODEL,
    )
    for flag in flags_in(cmd):
        assert flag in KNOWN_FLAGS, f"unexpected llama-server flag: {flag}"


def test_hf_repo_with_quant():
    cmd = build_server_command(
        ServerConfig(hf_repo="ggml-org/gemma-3-4b-it-GGUF", hf_quant="Q4_K_M")
    )
    assert "-hf" in cmd
    assert cmd[cmd.index("-hf") + 1] == "ggml-org/gemma-3-4b-it-GGUF:Q4_K_M"
    # HF loading must not also pass a local --model
    assert "--model" not in cmd


def test_hf_repo_quant_not_double_appended():
    cmd = build_server_command(
        ServerConfig(hf_repo="ggml-org/gemma-3-4b-it-GGUF:Q8_0", hf_quant="Q4_K_M")
    )
    assert cmd[cmd.index("-hf") + 1] == "ggml-org/gemma-3-4b-it-GGUF:Q8_0"


def test_hf_file_overrides_quant():
    cmd = build_server_command(
        ServerConfig(
            hf_repo="ggml-org/gemma-3-4b-it-GGUF",
            hf_file="gemma-3-4b-it-Q4_K_M.gguf",
        )
    )
    assert "-hff" in cmd
    assert cmd[cmd.index("-hff") + 1] == "gemma-3-4b-it-Q4_K_M.gguf"


def test_local_model_still_uses_model_flag():
    cmd = build_server_command(ServerConfig(), MODEL)
    assert "--model" in cmd
    assert "-hf" not in cmd


def test_row_split_mode():
    cmd = build_server_command(ServerConfig(gpu="row"), MODEL)
    i = cmd.index("-sm")
    assert cmd[i + 1] == "row"
    assert "-mg" not in cmd


# --- classify_startup_failure (reference test_server_lifecycle.py) ----------


@pytest.mark.parametrize(
    "log",
    [
        "ggml_cuda: CUDA error: out of memory",
        "cudaMalloc failed",
        "failed to allocate buffer",
    ],
)
def test_classify_out_of_memory(log):
    assert classify_startup_failure(log) == "out-of-memory"


@pytest.mark.parametrize(
    "log",
    [
        "error loading model architecture",
        "failed to load model",
        "gguf_init_from_file failed",
        "No such file or directory",
    ],
)
def test_classify_model_loading(log):
    assert classify_startup_failure(log) == "model-loading"


def test_classify_generic_startup():
    assert classify_startup_failure("some unrelated crash") == "startup"


# --- log tail ----------------------------------------------------------------


def test_read_server_log_returns_tail():
    m = ServerManager(ServerConfig())
    with tempfile.NamedTemporaryFile(mode="w+", suffix=".log", delete=False) as f:
        f.write("A" * 100 + "TAIL")
        m._server_log = f
    assert m.read_server_log(max_chars=4).endswith("TAIL")
    assert len(m.read_server_log(max_chars=4)) == 4


def test_read_server_log_empty_without_log():
    assert ServerManager(ServerConfig()).read_server_log() == ""


def test_stop_unlinks_final_server_log():
    """stop() must release the LAST log capture — _replace_server_log
    only cleans the previous one on the next launch, so a stopped
    manager used to leak one fd + /tmp file (round-2 advice)."""
    import os

    m = ServerManager(ServerConfig())
    m._replace_server_log()
    path = m._server_log.name
    assert os.path.exists(path)
    m.stop()
    assert m._server_log is None
    assert not os.path.exists(path)
    m.stop()  # idempotent


# --- shutdown escalation -------------------------------------------------------


def _proc(poll_value):
    proc = mock.Mock(spec=subprocess.Popen)
    proc.poll.return_value = poll_value
    proc.wait.return_value = 0
    return proc


def test_shutdown_terminates_running_process():
    proc = _proc(None)
    shutdown_server(proc)
    proc.terminate.assert_called_once()
    proc.kill.assert_not_called()


def test_shutdown_escalates_to_kill_on_timeout():
    proc = _proc(None)
    proc.wait.side_effect = [
        subprocess.TimeoutExpired(cmd="llama-server", timeout=10),
        0,
    ]
    shutdown_server(proc)
    proc.terminate.assert_called_once()
    proc.kill.assert_called_once()


def test_shutdown_noop_when_already_exited():
    proc = _proc(0)
    shutdown_server(proc)
    proc.terminate.assert_not_called()
    proc.kill.assert_not_called()


# --- await_server_ready ----------------------------------------------------------


def _mgr(**over) -> ServerManager:
    cfg = ServerConfig(server_startup_timeout=30, health_poll_interval=0)
    for k, v in over.items():
        setattr(cfg, k, v)
    return ServerManager(cfg)


def test_ready_when_health_ok():
    m = _mgr()
    with mock.patch.object(m, "_health_ok", return_value=True):
        assert m.await_server_ready(_proc(None)) is None


def test_keeps_polling_until_ok():
    m = _mgr()
    with mock.patch.object(
        m, "_health_ok", side_effect=[False, False, True]
    ) as h, mock.patch.object(srv.time, "sleep"):
        m.await_server_ready(_proc(None))
    assert h.call_count == 3


def test_raises_when_process_dies():
    m = _mgr()
    with mock.patch.object(m, "read_server_log", return_value="out of memory"):
        with pytest.raises(ServerStartupError) as ctx:
            m.await_server_ready(_proc(1))
    assert "exit code 1" in str(ctx.value)
    assert ctx.value.cause == "out-of-memory"


def test_raises_and_shuts_down_on_timeout():
    m = _mgr(server_startup_timeout=10)
    proc = _proc(None)  # alive but never healthy
    with mock.patch.object(srv.time, "monotonic", side_effect=[1000.0, 2000.0]), \
            mock.patch.object(m, "read_server_log", return_value=""):
        with pytest.raises(ServerStartupError) as ctx:
            m.await_server_ready(proc)
    assert "did not become ready" in str(ctx.value)
    assert ctx.value.cause == "timeout"
    proc.terminate.assert_called_once()


def test_cancel_aborts_wait_with_shutdown():
    """A canceled startup wait raises (cause 'canceled') and shuts the
    child down — it must never be mistaken for readiness (reference
    CancellableJob._canceled gate around the health poll)."""
    m = _mgr()
    m.cancel()
    proc = _proc(None)  # alive, would otherwise poll forever
    with mock.patch.object(m, "read_server_log", return_value=""):
        with pytest.raises(ServerStartupError) as ctx:
            m.await_server_ready(proc)
    assert ctx.value.cause == "canceled"
    proc.terminate.assert_called_once()


def test_cancel_mid_poll():
    """cancel() flipped between health polls aborts the next iteration."""
    m = _mgr()
    proc = _proc(None)

    def _flip():
        m.cancel()
        return False

    with mock.patch.object(m, "_health_ok", side_effect=_flip), \
            mock.patch.object(srv.time, "sleep"), \
            mock.patch.object(m, "read_server_log", return_value=""):
        with pytest.raises(ServerStartupError) as ctx:
            m.await_server_ready(proc)
    assert ctx.value.cause == "canceled"


# --- start_server state machine ------------------------------------------------


def test_start_server_resets_state_on_failure():
    """A failed startup shuts the child down and clears current_model so
    the next attempt re-launches (reference start_server recovery,
    routes.py:846-855)."""
    m = _mgr()
    proc = _proc(1)
    with mock.patch.object(srv.subprocess, "Popen", return_value=proc), \
            mock.patch.object(m, "read_server_log", return_value="gguf"):
        with pytest.raises(ServerStartupError) as ctx:
            m.start_server()
    assert ctx.value.cause == "model-loading"
    assert m.current_model is None
    # child already exited → shutdown is a no-op (no terminate on a corpse)
    proc.terminate.assert_not_called()


def test_start_server_reuses_live_same_model():
    m = _mgr()
    proc = _proc(None)
    with mock.patch.object(srv.subprocess, "Popen", return_value=proc) as p, \
            mock.patch.object(m, "_health_ok", return_value=True):
        m.start_server()
        assert p.call_count == 1
        m.start_server()  # same model, process alive → no respawn
        assert p.call_count == 1
    assert m.current_model == "local:model.gguf"


def test_start_server_swaps_model():
    m = _mgr()
    proc1, proc2 = _proc(None), _proc(None)
    with mock.patch.object(
        srv.subprocess, "Popen", side_effect=[proc1, proc2]
    ) as p, mock.patch.object(m, "_health_ok", return_value=True):
        m.start_server()
        m.cfg.model_name = "other.gguf"
        m.start_server()
        assert p.call_count == 2
    proc1.terminate.assert_called_once()  # old server shut down
    assert m.current_model == "local:other.gguf"


def test_start_server_swaps_on_hf_repo_change():
    """With -hf loading, model_name is not in the launch command — reuse
    must key on the hf repo, or changing it silently keeps serving the
    OLD model."""
    m = _mgr(hf_repo="org/modelA")
    proc1, proc2 = _proc(None), _proc(None)
    with mock.patch.object(
        srv.subprocess, "Popen", side_effect=[proc1, proc2]
    ) as p, mock.patch.object(m, "_health_ok", return_value=True):
        m.start_server()
        m.cfg.hf_repo = "org/modelB"
        m.start_server()
        assert p.call_count == 2  # respawned for the new repo
    proc1.terminate.assert_called_once()


def test_cancel_does_not_poison_next_launch():
    """cancel() aborts the CURRENT wait only; the next start_server on
    the long-lived executor singleton must launch normally."""
    m = _mgr()
    m.cancel()
    proc = _proc(None)
    with mock.patch.object(srv.subprocess, "Popen", return_value=proc), \
            mock.patch.object(m, "_health_ok", return_value=True):
        m.start_server()  # must not raise 'canceled'
    assert m.current_model == "local:model.gguf"


def test_model_name_escape_raises_value_error():
    # an explicit raise, not an assert (which vanishes under python -O)
    m = _mgr(model_name="../../etc/evil.gguf")
    with pytest.raises(ValueError, match="escapes model_path"):
        m.start_server()


def test_server_log_replaced_not_leaked(tmp_path):
    """Each launch closes and unlinks the previous startup log."""
    import os

    m = _mgr()
    old = tempfile.NamedTemporaryFile(
        mode="w+", prefix="llama_server_", suffix=".log", delete=False
    )
    m._server_log = old
    m._replace_server_log()
    assert not os.path.exists(old.name)
    assert m._server_log is not old
    os.unlink(m._server_log.name)
