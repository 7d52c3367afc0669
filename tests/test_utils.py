"""Observability utilities: curve CSV, JSONL events, phase timer."""

import json
import os

import jax.numpy as jnp
import numpy as np

from hybridode.utils import CSVCurveLogger, JSONLLogger, PhaseTimer


class TestCurveLogger:
    def test_writes_exp_lhm_format(self, tmp_path):
        p = str(tmp_path / "curve.csv")
        log = CSVCurveLogger(p)
        log.log(10, 521.2, 46.6)
        log.log(20, 430.1, 40.0)
        log.close()
        lines = open(p).read().strip().splitlines()
        # reference results/exp_lhm.csv format: iter,val_loss,train_loss
        assert lines[0] == "10,521.200000,46.600000"
        assert len(lines) == 2

    def test_none_path_noop(self):
        log = CSVCurveLogger(None)
        log.log(1, 1.0, 1.0)  # must not raise
        log.close()


class TestJSONLLogger:
    def test_appends_events(self, tmp_path):
        p = str(tmp_path / "events.jsonl")
        log = JSONLLogger(p)
        log.log("val", itr=10, val_loss=1.5)
        log.close()
        log = JSONLLogger(p)  # append mode
        log.log("done", wall=2.0)
        log.close()
        recs = [json.loads(l) for l in open(p)]
        assert [r["event"] for r in recs] == ["val", "done"]
        assert recs[0]["itr"] == 10
        assert all("t" in r for r in recs)


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        assert t.counts["a"] == 2
        assert "a: total=" in t.report()


class TestAdjointBarriers:
    def test_barriers_grads(self):
        """Adjoint solver with barrier-clipped steps: values + grads match the
        bounded-scan integrator with the same barriers."""
        import jax

        from hybridode.solvers import odeint_dopri5, odeint_dopri5_adjoint

        def field(t, y, lam):
            # forcing with a kink at t=2 (the barrier)
            return -lam * y + jnp.where(t >= 2.0, 0.5, 0.0)

        y0 = jnp.array([[1.0, 2.0]])
        ts = jnp.linspace(0.0, 4.0, 9)
        barriers = (2.0,)

        def loss(solver):
            def f(lam):
                ys, _ = solver(field, y0, ts, lam, rtol=1e-7, atol=1e-9, barriers=barriers)
                return jnp.sum(ys**2)

            return f

        v_scan, g_scan = jax.value_and_grad(loss(odeint_dopri5))(0.8)
        v_adj, g_adj = jax.value_and_grad(loss(odeint_dopri5_adjoint))(0.8)
        np.testing.assert_allclose(float(v_adj), float(v_scan), rtol=1e-5)
        np.testing.assert_allclose(float(g_adj), float(g_scan), rtol=1e-4)
