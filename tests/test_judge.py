"""EngineJudge: the two-stage choice-extraction protocol (deterministic
extractor first, LLM judge for the unresolved remainder — the reference's
extract_choice.py flow, with the judge running on OUR engine)."""

import numpy as np

from vlrlhf_tpu.eval.judge import JUDGE_TEMPLATE, EngineJudge, judge_unresolved


class _StubRunner:
    """Stands in for an EvalRunner over a judge model: records the prompts it
    was asked and answers from a canned map."""

    def __init__(self, answers):
        self.answers = answers
        self.seen = []

    def run_vqa(self, rows, batch_size=16):
        out = []
        for r in rows:
            self.seen.append(r["question"])
            key = next(k for k in self.answers if k in r["question"])
            out.append(dict(r, response=self.answers[key]))
        return out


def test_judge_only_sees_unresolved_rows():
    results = [
        {"question": "color of sky", "response": "B", "answer": "B",
         "A": "red", "B": "blue"},                         # regex-resolvable
        {"question": "main object", "response": "it looks fluffy and cuddly",
         "answer": "A", "A": "teddy bear", "B": "rock"},   # needs the judge
        {"question": "how many", "response": "the answer is C", "answer": "C",
         "A": "1", "B": "2", "C": "3"},                    # regex-resolvable
    ]
    stub = _StubRunner({"main object": "A"})
    judged = judge_unresolved(results, EngineJudge(stub))
    assert len(stub.seen) == 1  # only the unresolved row hit the judge
    assert "main object" in stub.seen[0]
    assert judged[1]["judged_choice"] == "A"
    assert judged[1]["response"] == "A"  # normalized for the scorer
    assert judged[0]["response"] == "B"  # untouched

    from vlrlhf_tpu.eval.scorers import multiple_choice_accuracy

    assert multiple_choice_accuracy(judged)["acc"] == 100.0


def test_judge_verbose_output_falls_back_to_extractor():
    rows = [{"question": "what animal", "options": {"A": "cat", "B": "dog"},
             "response": "some rambling"}]
    stub = _StubRunner({"what animal": "I think the answer is B."})
    out = EngineJudge(stub).extract(rows)
    assert out == ["B"]


def test_judge_z_means_unresolved():
    rows = [{"question": "what animal", "options": {"A": "cat", "B": "dog"},
             "response": "a spaceship"}]
    stub = _StubRunner({"what animal": "Z"})
    assert EngineJudge(stub).extract(rows) == [None]


def test_judge_prompt_matches_reference_protocol():
    assert "output a single uppercase character" in JUDGE_TEMPLATE
    assert "Example 1" in JUDGE_TEMPLATE and "Your output: " in JUDGE_TEMPLATE


def test_parse_score_grid():
    from vlrlhf_tpu.eval.judge import parse_score

    assert parse_score("0.8") == 0.8
    assert parse_score("1.0") == 1.0
    assert parse_score("1") == 1.0
    assert parse_score("0") == 0.0
    assert parse_score("Correctness: 0.5 because...") == 0.5
    assert parse_score(".7") == 0.7
    # raw float kept (official MM-Vet grader averages unsnapped scores)
    assert parse_score("0.85 maybe") == 0.85
    assert parse_score("no idea") is None


def test_grade_freeform_mmvet_role():
    """MM-Vet grading pass: every row with a gold answer is graded 0-1;
    unparseable judge output leaves the row ungraded (scorer falls back)."""
    from vlrlhf_tpu.eval.benchmarks import MMVet
    from vlrlhf_tpu.eval.judge import grade_freeform

    results = [
        {"question": "How many apples?", "answer": "3 <AND> red",
         "response": "five"},
        {"question": "Which city is this?", "answer": "paris <OR> france",
         "response": "This is Paris."},
        {"question": "Describe.", "answer": "",
         "response": "free text, no gold"},            # never graded
        {"question": "Weird row", "answer": "something",
         "response": "???"},                           # judge fails to emit
    ]
    stub = _StubRunner({"How many apples": "0.0",
                        "Which city": "1.0",
                        "Weird row": "hmm, not sure"})
    graded = grade_freeform(results, EngineJudge(stub))
    assert len(stub.seen) == 3  # the no-gold row never hit the judge
    assert graded[0]["judge_score"] == 0.0
    assert graded[1]["judge_score"] == 1.0
    assert "judge_score" not in graded[2]
    assert "judge_score" not in graded[3]

    # MMVet.score: judge_score where present, substring fallback otherwise
    # (row 3: "something" not in "???" -> 0)
    m = MMVet().score(graded)
    assert m["acc"] == round(100 * (0.0 + 1.0 + 0.0 + 0.0) / 4, 2)
    # fallback-only (no judge): row 1 matches by substring? "-1 <AND> -5"
    # not a substring; row 2 gold "birthday <OR> party" not a substring ->
    # substring fallback scores 0 for structured golds, which is exactly why
    # the grading judge exists
    m2 = MMVet().score(results)
    assert m2["acc"] == 0.0
