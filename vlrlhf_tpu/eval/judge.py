"""LLM choice-extraction judge served by OUR generation engine.

Replaces the reference's external lmdeploy judge server
(/root/reference/scripts/eval/mmbench.sh:25-35,
 eval/seedbench/extract_choice.py) with the same judging protocol, but the
judge model runs through this framework's own engine — no second serving
stack. The deterministic regex/content extractor (eval/scorers.py) stays the
first line; the judge only sees responses it could not resolve, exactly like
the reference's two-stage flow (extract_choice.py:40-46 fast path, then the
pipeline for `unclear_results`).
"""

from __future__ import annotations

from typing import Optional, Sequence

from vlrlhf_tpu.eval.scorers import extract_choice

# the reference's judging prompt, verbatim protocol
# (eval/seedbench/extract_choice.py:5-20)
JUDGE_TEMPLATE = (
    "You are an AI assistant who will help me to match "
    "an answer with several options of a single-choice question. "
    "You are provided with a question, several options, and an answer, "
    "and you need to find which option is most similar to the answer. "
    "If the meaning of all options are significantly different from the "
    "answer, output Z. "
    "Your should output a single uppercase character in A, B, C, D (if they "
    "are valid options), and Z. \n"
    "Example 1: \n"
    "Question: What is the main object in image?\n"
    "Options: A. teddy bear B. rabbit C. cat D. dog\n"
    "Answer: a cute teddy bear\nYour output: A\n"
    "Example 2: \n"
    "Question: What is the main object in image?\n"
    "Options: A. teddy bear B. rabbit C. cat D. dog\n"
    "Answer: Spider\nYour output: Z\n"
    "Example 3: \n"
    "Question: {}?\nOptions: {}\nAnswer: {}\nYour output: "
)


class EngineJudge:
    """Batch choice-matching over an EvalRunner (any text-capable family).

    `runner` is an eval.harness.EvalRunner wrapping the judge model — the
    same machinery that serves the benchmark model, so a judge deployment is
    one more checkpoint, not one more serving system."""

    def __init__(self, runner, batch_size: int = 16):
        self.runner = runner
        self.batch_size = batch_size

    def extract(self, rows: Sequence[dict]) -> list[Optional[str]]:
        """rows: [{question, options: {letter: text}, response}] ->
        one letter (or None for the reference's 'Z' / unparseable)."""
        prompts = []
        for r in rows:
            options = " ".join(
                f"{k}. {v}" for k, v in sorted(r["options"].items())
            )
            prompts.append(
                JUDGE_TEMPLATE.format(
                    str(r["question"]).rstrip("?"), options, r["response"]
                )
            )
        judged = self.runner.run_vqa(
            [{"question": p, "img": None} for p in prompts],
            batch_size=self.batch_size,
        )
        out: list[Optional[str]] = []
        for r, j in zip(rows, judged):
            text = j["response"].strip()
            letter = text[:1].upper() if text else ""
            if letter in r["options"]:
                out.append(letter)
            else:
                # judge was verbose — run the deterministic extractor on it
                out.append(extract_choice(text, r["options"]))
        return out


def judge_unresolved(
    results: Sequence[dict],
    judge: "EngineJudge",
    options_keys: Sequence[str] = ("A", "B", "C", "D", "E"),
    question_key: str = "question",
) -> list[dict]:
    """Two-stage extraction over benchmark results: rows whose response the
    deterministic extractor can't resolve get a 'judged_choice' field from
    the LLM judge; resolved rows pass through untouched. Mirrors
    extract_choice.py's fast-path + unclear_results split."""
    unresolved_idx = []
    unresolved_rows = []
    out = [dict(r) for r in results]
    for i, r in enumerate(out):
        options = {
            k: r[k] for k in options_keys
            if r.get(k) not in (None, "") and r.get(k) == r.get(k)  # not NaN
        }
        if extract_choice(r["response"], options or None) is None and options:
            unresolved_idx.append(i)
            unresolved_rows.append(
                {"question": r.get(question_key, ""), "options": options,
                 "response": r["response"]}
            )
    if unresolved_rows:
        for i, letter in zip(unresolved_idx, judge.extract(unresolved_rows)):
            if letter is not None:
                out[i]["judged_choice"] = letter
                # scoring reads `response`; normalize to a clean letter
                out[i]["response"] = letter
    return out
