"""Retrying LLM-API client wrapper (reference F15 operational boundary).

The reference calls its scoring API through a hand-rolled retry loop
(run_ats_enrichment.py:219-286, src/utils/api_utils.py:12-54) whose state
machine is:

- up to ``max_retries`` attempts;
- HTTP 200 with a well-formed ``choices[0].message`` → return the payload;
- HTTP 200 with a malformed body (missing/empty ``choices``, or a body
  that fails JSON decoding) → wait ``retry_delay``, retry;
- HTTP 401 → give up immediately (retrying an invalid key cannot help);
- HTTP 429 → honor the ``Retry-After`` header, falling back to
  ``retry_delay`` when absent/unparseable, then retry;
- any other status or transport error → wait ``retry_delay``, retry;
- attempts exhausted → ``None`` (the caller records a zero score).

``RetryingLLMClient`` reproduces that machine over an INJECTABLE transport
and sleep, so the retry/backoff sequencing is provable in tests without a
network or a real clock, and ``llm_match_scores``
(operators/enrichment.py) gets a shipped production client instead of
delegating retry to the caller.  The engine never executes this on the hot
path — per-partition clients are created inside ``mapInPandas`` by the
factory, exactly like the stub client.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import Any

# transport(request) -> (status_code, headers, parsed_json_body_or_None).
# A raised exception models a network/timeout failure; a None body models a
# 200 whose payload failed JSON decoding.  Keeping the transport this small
# means requests/httpx/a test list all wrap in two lines.
Transport = Callable[[dict[str, Any]], tuple[int, dict[str, str], Any]]


class RetryingLLMClient:
    """Reference-faithful retry/backoff around an injectable transport."""

    def __init__(
        self,
        transport: Transport,
        max_retries: int = 3,
        retry_delay: float = 5.0,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.transport = transport
        self.max_retries = max_retries
        self.retry_delay = retry_delay
        self.sleep = sleep

    def call(self, messages: list[dict[str, str]], model: str) -> Any | None:
        request = {"model": model, "messages": messages}
        for _attempt in range(self.max_retries):
            try:
                status, headers, body = self.transport(request)
            except Exception:  # noqa: BLE001 — transport errors retry, like requests.RequestException
                self.sleep(self.retry_delay)
                continue
            if status == 200:
                # 200 with a decode failure or a malformed choices structure
                # retries (run_ats_enrichment.py:250-260)
                if isinstance(body, dict) and body.get("choices") and isinstance(
                    body["choices"][0], dict
                ) and "message" in body["choices"][0]:
                    return body
                self.sleep(self.retry_delay)
                continue
            if status == 401:
                return None
            if status == 429:
                raw = (headers or {}).get("Retry-After")
                try:
                    delay = float(int(raw))
                except (TypeError, ValueError):
                    delay = self.retry_delay
                self.sleep(delay)
                continue
            self.sleep(self.retry_delay)
        return None


def content_of(payload: Any) -> str:
    """The assistant text of a chat-completions payload ('' when absent)."""
    try:
        return payload["choices"][0]["message"]["content"] or ""
    except (KeyError, IndexError, TypeError):
        return ""


def retrying_match_client_factory(
    transport_factory: Callable[[], Transport],
    model: str,
    max_retries: int = 3,
    retry_delay: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
):
    """Bridge ``RetryingLLMClient`` into the ``ClientFactory`` slot of
    ``llm_match_scores``: one client per partition, one chat request per
    chunk, response repaired by ``functions.llm_repair`` (the reference's
    batch prompt + repair pipeline, run_ats_enrichment.py:289-906).

    The transport FACTORY (not a transport) is what ships to executors, so
    sockets/sessions are created executor-side and never pickled.
    """
    from ..functions.llm_repair import repair_batch_percentages

    def factory():
        client = RetryingLLMClient(
            transport_factory(),
            max_retries=max_retries,
            retry_delay=retry_delay,
            sleep=sleep,
        )

        def score(
            resume_text: str, jobs: list[str]
        ) -> list[tuple[float, list[str], list[str]]]:
            numbered = "\n\n".join(
                f"Job {i + 1}:\n{job}" for i, job in enumerate(jobs)
            )
            messages = [
                {
                    "role": "user",
                    "content": (
                        "Score how well this resume matches each job, as a "
                        "JSON array of {job_number, match_percentage}.\n\n"
                        f"Resume:\n{resume_text}\n\n{numbered}"
                    ),
                }
            ]
            payload = client.call(messages, model)
            pcts = repair_batch_percentages(content_of(payload), len(jobs))
            return [(p, [], []) for p in pcts]

        return score

    return factory
