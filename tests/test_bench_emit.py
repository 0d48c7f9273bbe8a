"""bench.py incremental-emission contract: the LAST JSON line on stdout is
the artifact (the driver keeps the tail), so every recorded fact — including
budget-skip markers — must be present in the final emission (a skip that
only lands in a never-re-emitted dict silently vanishes from the capture)."""

import contextlib
import importlib.util
import io
import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_emit", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_emit"] = mod
    spec.loader.exec_module(mod)
    # no jax, no chip: stub the measurement + cache hooks
    import fastvocoder_tpu

    monkeypatch.setattr(
        fastvocoder_tpu, "enable_compilation_cache", lambda *a, **k: None
    )
    mod.load_mels = lambda: None
    # neutralize the real budget watchdog: with an exhausted fake budget its
    # daemon thread would os._exit(0) the WHOLE pytest process ~2s after
    # main() returns (it has its own tests in test_bench_watchdog.py)
    mod._watchdog = lambda *a, **k: None
    return mod


def _run_main(bench):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main()
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert lines, "no artifact emitted"
    return [json.loads(l) for l in lines]


def test_final_emission_carries_all_rows(bench):
    def fake_model(model_name, conf, key, baseline, root, mels, extras):
        extras[key] = {"rtf": 0.000123, "vs_baseline": 400.0}

    bench._bench_model = fake_model
    bench.bench_training = (
        lambda root, extras, emit, rows_spec=None: extras.setdefault(
            "train_step", {}
        ).update(hifigan_gan={"ms_per_step": 100.0})
    )

    emissions = _run_main(bench)
    last = emissions[-1]
    assert last["metric"] == "basis_melgan_rtf"
    assert last["value"] == 0.000123
    assert "train_step" in last["extras"]
    # one emission per model group at least (supersession protocol)
    assert len(emissions) >= len(bench.MODELS)


def test_budget_skips_reach_the_final_emission(bench, monkeypatch):
    """Exhaust the budget after the headline: every later group must appear
    under extras['skipped'] IN THE LAST EMITTED LINE, not just in memory."""
    def fake_model(model_name, conf, key, baseline, root, mels, extras):
        extras[key] = {"rtf": 0.000123, "vs_baseline": 400.0}
        monkeypatch.setattr(bench, "BUDGET_S", -1000.0)  # now out of budget

    bench._bench_model = fake_model
    # bench_training honors the real budget gate: all rows must skip+emit
    last = _run_main(bench)[-1]
    skipped = last["extras"].get("skipped", [])
    measured = {k for k in last["extras"] if k.endswith("_rtf")}
    assert measured == {"basis_melgan_rtf"}
    for _, _, key, _ in bench.MODELS:
        assert key in skipped or key == "basis_melgan_rtf"
    for row in ("train_step.hifigan_gan", "train_step.hifigan_gan_unfused",
                "train_step.basis_melgan_pre_adv"):
        assert row in skipped


def test_fmt_rtf_whole_numbers():
    sys.path.insert(0, "tools")
    from render_bench_tables import fmt_rtf

    assert fmt_rtf(0.000106) == "0.000106"
    assert fmt_rtf(1.0) == "1"
    assert fmt_rtf(10.0) == "10"
    assert fmt_rtf(None) == "—"
