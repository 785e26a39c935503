"""Triple extraction — the flagship operator (reference L1-L8 + J1-J7).

The reference drives a llama-server with grammar-constrained JSON
completions, one asyncio task per report bounded by a semaphore of
`parallel_slots + buffer` (webapp/llm_processing/routes.py:412-670). Here
the same shape is Spark-native:

  conversations → mapInPandas(extract) → from_json → posexplode → triples

* One `mapInPandas` stage: each Arrow batch (spark.sql.execution.arrow.
  maxRecordsPerBatch rows) becomes one backend micro-batch. Cluster-level
  parallelism is partition count; request-level concurrency lives inside
  the backend (bounded thread pool = the reference's semaphore).
* Backends are pluggable behind `complete(prompts) -> contents`:
  - StubBackend: deterministic, rule-based, grammar-shaped JSON with the
    exact output quirks the reference's tests pin (end markers, trailing
    prose/comma, nulls, rare malformed rows) — used for correctness gates
    and benchmarks (zero network variance).
  - HttpBackend: llama.cpp-server/OpenAI-compatible chat endpoint with
    seed/temperature/json_schema, bounded in-flight requests, lazy
    per-executor singleton with health gating (reference
    webapp/llm_processing/routes.py:761-804). Never exercised in tests.
* JSON repair is the ported J1-J5 kernel; a failed parse yields an empty
  row with error=True — the row always survives (reference
  webapp/llm_processing/routes.py:980-993).
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.json_repair import repair_and_parse
from llmaix_spark.schemas import EXTRACTION_RAW

# predicate phrases the stub grammar recognizes (mirrors the de-facto
# schema role of the reference's GBNF grammar,
# webapp/llm_processing/forms.py:19-33)
STUB_PREDICATES = {
    "works at": "works_at",
    "lives in": "lives_in",
    "manages": "manages",
    "uses": "uses",
    "visited": "visited",
}

_ENTITY = r"[A-ZÄÖÜ][\w\-]*(?: [A-ZÄÖÜ][\w\-]*)*"
_PHRASES = "|".join(sorted(STUB_PREDICATES, key=len, reverse=True))
STUB_PATTERN = re.compile(rf"({_ENTITY}) ({_PHRASES}) ({_ENTITY})")

DEFAULT_PROMPT = (
    "Extract all (subject, predicate, object) triples from the "
    "conversation below as JSON {{\"triples\": [...]}}.\n\n{report}"
)


@dataclass
class ExtractionConfig:
    prompt_template: str = DEFAULT_PROMPT
    backend: str = "stub"  # stub | http
    endpoint: str | None = None
    # reference: Semaphore(parallel_slots + buffer_slots),
    # webapp/llm_processing/routes.py:619-620
    parallel_slots: int = 1
    buffer_slots: int = 10
    seed: int = 42
    temperature: float = 0.0
    n_predict: int = 2048
    # stub-only: fraction of outputs rendered with a formatting quirk
    quirk_rate: float = 0.25
    # stub-only: fraction of outputs rendered unparseable (error path)
    malformed_rate: float = 0.002
    # stub-only: fraction of outputs cut off mid-generation and flagged
    # truncated (L8 — reference warns on finish_reason == "length" /
    # stop_type == "limit", webapp/llm_processing/routes.py:513-535)
    truncate_rate: float = 0.0
    # stub-only: simulated per-conversation inference cost (ms, busy-wait).
    # The rule-based stub costs ~µs/conv — 5-6 orders of magnitude below
    # real grammar-constrained decoding — so scaling benchmarks on it
    # measure Spark's scheduler floor, not the workload. A calibrated
    # busy-wait restores the compute:coordination ratio of a real
    # backend. 0 (default) = off; see BASELINE.md measurement protocol.
    simulate_cost_ms: float = 0.0
    json_schema: dict | None = None
    extra: dict = field(default_factory=dict)


class StubBackend:
    """Deterministic rule-based extractor posing as a grammar-constrained
    LLM. The *same* rules drive the pandas oracle in tests, so triple sets
    are exactly comparable; quirk selection is a stable hash of the prompt
    (no RNG → bitwise reproducible across runs and partitioners)."""

    def __init__(self, cfg: ExtractionConfig):
        self.cfg = cfg

    @staticmethod
    def extract_triples(text: str) -> list[dict]:
        out = []
        for m in STUB_PATTERN.finditer(text or ""):
            out.append(
                {
                    "subj": m.group(1),
                    "pred": STUB_PREDICATES[m.group(2)],
                    "obj": m.group(3),
                }
            )
        return out

    @staticmethod
    def _stable_hash(s: str) -> int:
        # FNV-1a 64-bit — stable across processes (unlike hash())
        h = 0xCBF29CE484222325
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def _render(self, triples: list[dict], prompt: str) -> tuple[str, bool]:
        """Render (content, truncated). Truncation = the generation hit
        the length limit mid-output (stub twin of stop_type == 'limit'):
        the content is cut, the flag is set — downstream repair usually
        turns the row into error=True, exactly like a real length-stop."""
        # ensure_ascii=False: a real LLM emits raw UTF-8; \uXXXX escapes
        # would be destroyed by the (reference-faithful) backslash strip
        # in the J3 repair step.
        body = json.dumps({"triples": triples, "n": len(triples)}, ensure_ascii=False)
        h = self._stable_hash(prompt)
        if (h % 10_000) / 10_000.0 < self.cfg.malformed_rate:
            return body[: max(len(body) // 2, 1)].rstrip("}"), False
        if ((h // 11) % 10_000) / 10_000.0 < self.cfg.truncate_rate:
            return body[: max(2 * len(body) // 3, 1)].rstrip("}"), True
        if (h % 1000) / 1000.0 < self.cfg.quirk_rate:
            quirk = h // 7 % 5
            if quirk == 0:
                return body + "<|eot_id|>", False
            if quirk == 1:
                return body + "</s>", False
            if quirk == 2:
                return body + " Here is your answer, hope it helps!", False
            if quirk == 3:
                return body[:-1] + ",}", False
            return body[:-1] + ', "note": null,}', False
        return body, False

    def complete(self, prompts: list[str]) -> list[tuple[str, bool]]:
        out = [self._render(self.extract_triples(p), p) for p in prompts]
        if self.cfg.simulate_cost_ms > 0:
            import time

            # deterministic CPU cost standing in for local LLM inference
            deadline = time.perf_counter() + (
                self.cfg.simulate_cost_ms / 1000.0
            ) * len(prompts)
            while time.perf_counter() < deadline:
                pass
        return out


class HttpBackend:
    """llama.cpp-server / OpenAI-compatible backend.

    Three endpoint modes mirroring the reference's L2/L3/L4 branches:
      * "completion" — POST /completion with {prompt, n_predict, seed,
        temperature, cache_prompt, json_schema?}
        (reference fetch_completion_result, routes.py:412-474)
      * "chat" — POST /v1/chat/completions with system+user messages and
        response_format json_schema (fetch_chat_result, routes.py:333-410)
      * "openai" — same wire shape as "chat" plus Authorization header
        and strict json_schema (fetch_chat_result_openai, routes.py:256-331)

    Bounded thread pool = the asyncio semaphore (parallel_slots + buffer).
    One instance per executor process (`_get_backend`), health-gated on
    first use (reference `_await_server_ready`, routes.py:761-804; the
    OpenAI branch has no /health — gate skipped).
    """

    def __init__(self, cfg: ExtractionConfig):
        import urllib.request

        self.cfg = cfg
        self._urllib = urllib.request
        if not cfg.endpoint:
            raise ValueError("HttpBackend requires cfg.endpoint")
        self.mode = cfg.extra.get("endpoint_type", "completion")
        self.api_key = cfg.extra.get("api_key")
        self.model = cfg.extra.get("model", "default")
        self.system_prompt = cfg.extra.get(
            "system_prompt", "You are a strict JSON triple extractor."
        )
        self._healthy = self.mode == "openai"  # hosted APIs: no /health

    def _check_health(self) -> None:
        if self._healthy:
            return
        url = self.cfg.endpoint.rstrip("/") + "/health"
        with self._urllib.urlopen(url, timeout=30) as r:
            if json.loads(r.read()).get("status") != "ok":
                raise RuntimeError("LLM server not healthy")
        self._healthy = True

    def _post(self, path: str, payload: dict) -> dict:
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = self._urllib.Request(
            self.cfg.endpoint.rstrip("/") + path,
            data=json.dumps(payload).encode(),
            headers=headers,
        )
        with self._urllib.urlopen(req, timeout=1200) as r:
            return json.loads(r.read())

    def _one(self, prompt: str) -> tuple[str, bool]:
        """One request → (content, truncated). L8: llama.cpp /completion
        reports a length-stop as stop_type == 'limit' / truncated: true;
        the chat endpoints report finish_reason == 'length' (reference
        warning path, webapp/llm_processing/routes.py:513-535)."""
        if self.mode == "completion":
            payload = {
                "prompt": prompt,
                "n_predict": self.cfg.n_predict,
                "temperature": self.cfg.temperature,
                "seed": self.cfg.seed,
                "cache_prompt": True,
            }
            if self.cfg.json_schema:
                payload["json_schema"] = self.cfg.json_schema
            data = self._post("/completion", payload)
            truncated = (
                data.get("stop_type") == "limit"
                or data.get("truncated") is True
            )
            return data.get("content", ""), truncated
        # chat / openai
        payload = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": self.system_prompt},
                {"role": "user", "content": prompt},
            ],
            "temperature": self.cfg.temperature,
            "seed": self.cfg.seed,
        }
        if self.cfg.json_schema:
            payload["response_format"] = {
                "type": "json_schema",
                "json_schema": {
                    "name": "extraction",
                    "schema": self.cfg.json_schema,
                    "strict": True,
                },
            }
        if self.mode == "openai":
            payload["max_completion_tokens"] = self.cfg.n_predict
        else:
            # llama.cpp chat endpoint: without a bound a looping model
            # generates to the server's hard limit and the L8 truncation
            # accounting loses its reference point
            payload["max_tokens"] = self.cfg.n_predict
        resp = self._post("/v1/chat/completions", payload)
        choices = resp.get("choices") or []
        if not choices:
            return "", False
        last = choices[-1]
        content = (last.get("message") or {}).get("content", "") or ""
        return content, last.get("finish_reason") == "length"

    def _one_isolated(self, prompt: str) -> tuple[str, bool]:
        """Per-request error isolation: a failed/timeout request yields
        empty content (→ repair parses nothing → error=True row) instead
        of killing the whole Arrow batch — the reference's semantics for
        reports whose request never returned a "content" key
        (webapp/llm_processing/routes.py:955-960)."""
        try:
            return self._one(prompt)
        except Exception:
            return "", False

    def complete(self, prompts: list[str]) -> list[tuple[str, bool]]:
        from concurrent.futures import ThreadPoolExecutor

        self._check_health()
        slots = self.cfg.parallel_slots + self.cfg.buffer_slots
        with ThreadPoolExecutor(max_workers=slots) as pool:
            return list(pool.map(self._one_isolated, prompts))


_BACKEND_SINGLETON: dict[str, object] = {}


def _get_backend(cfg: ExtractionConfig):
    """Per-executor lazy singleton (the reference keeps one llama-server
    alive across jobs keyed on current_model, routes.py:806-863). The key
    carries every output-shaping knob — stub rates, sampling params,
    schema, and the whole `extra` dict (endpoint_type/model/api_key/
    system_prompt) — two jobs with different configs in one long-lived
    worker must never share an instance."""
    key = json.dumps(
        [
            cfg.backend,
            cfg.endpoint,
            cfg.simulate_cost_ms,
            cfg.quirk_rate,
            cfg.malformed_rate,
            cfg.truncate_rate,
            cfg.temperature,
            cfg.n_predict,
            cfg.seed,
            cfg.parallel_slots,
            cfg.buffer_slots,
            cfg.json_schema,
            sorted((str(k), str(v)) for k, v in cfg.extra.items()),
        ],
        sort_keys=True,
    )
    be = _BACKEND_SINGLETON.get(key)
    if be is None:
        be = (
            StubBackend(cfg) if cfg.backend == "stub" else HttpBackend(cfg)
        )
        _BACKEND_SINGLETON[key] = be
    return be


def extract_raw(
    conversations: DataFrame,
    cfg: ExtractionConfig,
    variable_col: str | None = None,
) -> DataFrame:
    """conversations(conv_id, conv_text[, variable]) → EXTRACTION_RAW via
    mapInPandas.

    One Arrow batch = one backend micro-batch; the prompt is formatted
    like the reference's `prompt.format(report=...)`
    (webapp/llm_processing/routes.py:496). With `variable_col` set, each
    row also formats `{symptom}` (the reference's per-symptom prompt,
    routes.py:492-496) and the output carries the variable through.
    """
    from pyspark.sql import types as T

    template = cfg.prompt_template
    cfg_b = cfg  # closure capture
    out_schema = EXTRACTION_RAW
    if variable_col:
        out_schema = T.StructType(
            [EXTRACTION_RAW.fields[0],
             T.StructField("variable", T.StringType(), False),
             *EXTRACTION_RAW.fields[1:]]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        backend = _get_backend(cfg_b)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if variable_col:
                prompts = [
                    template.format(
                        report=t if t is not None else "", symptom=v
                    )
                    for t, v in zip(pdf["conv_text"], pdf[variable_col])
                ]
            else:
                prompts = [
                    template.format(report=t if t is not None else "")
                    for t in pdf["conv_text"]
                ]
            results = backend.complete(prompts)
            contents = [c for c, _ in results]
            truncated = [t for _, t in results]
            parsed, errors = [], []
            for c in contents:
                d, _repaired, err = repair_and_parse(c)
                parsed.append(json.dumps(d))
                errors.append(err)
            out = {"conv_id": pdf["conv_id"].values}
            if variable_col:
                out["variable"] = pdf[variable_col].values
            out.update(
                {
                    "content": contents,
                    "parsed": parsed,
                    "error": errors,
                    "truncated": truncated,
                }
            )
            yield pd.DataFrame(out)

    return conversations.mapInPandas(run, out_schema)


def extraction_run_metrics(raw: DataFrame) -> DataFrame:
    """L8/A-side run accounting: one row of totals. The reference emits a
    warning_job per length-stopped report (routes.py:513-535) and keeps an
    error_count (routes.py:980-993); distributed, both become counters
    aggregated from the raw table — map-side combinable, no driver loop."""
    return raw.agg(
        F.count(F.lit(1)).alias("n_conversations"),
        F.coalesce(
            F.sum(F.col("error").cast("bigint")), F.lit(0)
        ).alias("n_errors"),
        F.coalesce(
            F.sum(F.col("truncated").cast("bigint")), F.lit(0)
        ).alias("n_truncated"),
    )


TRIPLE_ARRAY_SCHEMA = (
    "struct<triples: array<struct<subj:string,pred:string,obj:string>>,"
    " n: string>"
)


def triples_from_raw(raw: DataFrame) -> DataFrame:
    """EXTRACTION_RAW → triples_raw(conv_id, subj_surface, pred,
    obj_surface). JVM-side from_json + explode (J7's pivot, but against
    the fixed job schema instead of a dynamic pivot)."""
    j = raw.withColumn("j", F.from_json("parsed", TRIPLE_ARRAY_SCHEMA))
    return (
        j.select("conv_id", F.explode("j.triples").alias("t"))
        .select(
            "conv_id",
            F.col("t.subj").alias("subj_surface"),
            F.col("t.pred").alias("pred"),
            F.col("t.obj").alias("obj_surface"),
        )
        .filter(
            F.col("subj_surface").isNotNull() & F.col("obj_surface").isNotNull()
        )
    )


def pivot_fields(raw: DataFrame, field_names: list[str]) -> DataFrame:
    """J7: parsed-JSON keys → columns, against the job's FIXED field set
    (the reference pivots whatever keys the LLM emitted,
    webapp/llm_processing/routes.py:1029-1042 — but its grammar already
    pinned the key set, so a static projection is semantically equal and
    lets Catalyst prune). Missing keys → NULL; every value a string
    (reference :995-1000)."""
    m = F.from_json("parsed", "map<string,string>")
    return raw.select(
        "conv_id",
        "error",
        *[m.getItem(k).alias(k) for k in field_names],
    )


def extract_with_variables(
    transcripts: DataFrame,
    variables: list[str],
    cfg: ExtractionConfig | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """L7: every conversation × every variable prompted once, the
    reference's per-report symptom loop
    (webapp/llm_processing/routes.py:480-496) recast as a broadcast
    crossJoin — the variable list is tiny and replicated to every
    executor, so the fan-out is narrow (no shuffle of the conversations),
    and the mapInPandas stage parallelizes across BOTH axes. Returns the
    raw table with a `variable` column; pivot wide with
    `pivot_variable_field`."""
    from llmaix_spark.operators.assembly import assemble_conversations

    cfg = cfg or ExtractionConfig()
    convs = assemble_conversations(transcripts).select("conv_id", "conv_text")
    vars_df = transcripts.sparkSession.createDataFrame(
        [(v,) for v in variables], "variable string"
    )
    fan = convs.crossJoin(F.broadcast(vars_df))
    if num_partitions:
        fan = fan.repartition(num_partitions, "conv_id", "variable")
    return extract_raw(fan, cfg, variable_col="variable")


def pivot_variable_field(
    raw_var: DataFrame, variables: list[str], field: str
) -> DataFrame:
    """(conv_id, variable, parsed, ...) → one row per conversation with a
    `<variable>` column holding the parsed JSON's `field` value — the
    reference's per-symptom columns in the export CSV. Explicit pivot
    value list: no extra distinct-scan, and the output schema is fixed
    at plan time (Catalyst can prune)."""
    m = F.from_json("parsed", "map<string,string>")
    long = raw_var.select("conv_id", "variable", m.getItem(field).alias("_v"))
    return (
        long.groupBy("conv_id")
        .pivot("variable", variables)
        .agg(F.first("_v"))
    )


def extract_triples(
    transcripts: DataFrame,
    cfg: ExtractionConfig | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end narrow pipeline: assemble → extract → explode.

    Returns (triples_raw, extraction_raw). A deterministic
    `repartition(n, conv_id)` before the UDF keeps micro-batch
    composition stable and skew-balanced (SURVEY §4.2 rule 1).
    """
    from llmaix_spark.operators.assembly import assemble_conversations

    cfg = cfg or ExtractionConfig()
    convs = assemble_conversations(transcripts)
    if num_partitions:
        convs = convs.repartition(num_partitions, "conv_id")
    raw = extract_raw(convs.select("conv_id", "conv_text"), cfg)
    return triples_from_raw(raw), raw
