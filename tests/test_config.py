"""Tests for the expression DSL and YAML config loader (reference L6 parity)."""

import pytest

from mola_lidar_odometry_tpu.utils.expr import Expr, ExprError
from mola_lidar_odometry_tpu.utils.config import (
    load_yaml_text,
    load_yaml_file,
    as_bool,
    as_float,
    ConfigError,
)


class TestExpr:
    def test_const(self):
        assert Expr("1.5 + 2*3").const_value() == pytest.approx(7.5)
        assert Expr(4).const_value() == 4.0
        assert Expr("1e-3").const_value() == pytest.approx(0.001)

    def test_precedence_and_power(self):
        assert Expr("2+3*4^2").const_value() == pytest.approx(50.0)
        assert Expr("-2^2").const_value() == pytest.approx(-4.0)  # unary binds whole pow
        assert Expr("2^3^2").const_value() == pytest.approx(512.0)  # right assoc

    def test_funcs(self):
        assert Expr("max(1, 2)").const_value() == 2.0
        assert Expr("min(3, 2, 1)").const_value() == 1.0
        assert Expr("sqrt(16)").const_value() == 4.0
        assert Expr("saturate(5, 0, 2)").const_value() == 2.0

    def test_runtime_vars(self):
        e = Expr("(0.1e-2 + sqrt(wx^2+wy^2+wz^2)*0.1)*ESTIMATED_SENSOR_MAX_RANGE")
        assert e.vars == {"wx", "wy", "wz", "ESTIMATED_SENSOR_MAX_RANGE"}
        v = e({"wx": 0.0, "wy": 0.0, "wz": 2.0, "ESTIMATED_SENSOR_MAX_RANGE": 100.0})
        assert float(v) == pytest.approx((0.001 + 0.2) * 100.0)

    def test_reference_threshold_expr(self):
        # The annealed matcher threshold from pipelines/lidar3d-default.yaml:198
        src = (
            "2.0*max(ADAPTIVE_THRESHOLD_SIGMA, 2.0*ADAPTIVE_THRESHOLD_SIGMA"
            "-(2.0*ADAPTIVE_THRESHOLD_SIGMA-0.5*ADAPTIVE_THRESHOLD_SIGMA)*ICP_ITERATION/30)"
        )
        e = Expr(src)
        sig = 2.0
        # iteration 0: threshold = 2 * 2sigma = 8
        assert float(e({"ADAPTIVE_THRESHOLD_SIGMA": sig, "ICP_ITERATION": 0})) == pytest.approx(8.0)
        # iteration >= 30: annealed to 2 * max(sigma, 0.5 sigma) = 2 sigma
        assert float(e({"ADAPTIVE_THRESHOLD_SIGMA": sig, "ICP_ITERATION": 30})) == pytest.approx(4.0)

    def test_traced_eval(self):
        import jax
        import jax.numpy as jnp

        e = Expr("max(0.20, 0.55*1e-2*R)")
        out = jax.jit(lambda r: e({"R": r}))(jnp.float32(80.0))
        assert float(out) == pytest.approx(0.44)

    def test_errors(self):
        with pytest.raises(ExprError):
            Expr("1 +")
        with pytest.raises(ExprError):
            Expr("foo(1,2,3,4)").const_value()
        with pytest.raises(ExprError):
            Expr("x + 1").const_value()


class TestYaml:
    def test_env_substitution(self):
        cfg = load_yaml_text("a: ${FOO|7}\nb: '${BAR|hello}'", env={})
        assert cfg["a"] == 7 and cfg["b"] == "hello"
        cfg = load_yaml_text("a: ${FOO|7}", env={"FOO": "42"})
        assert cfg["a"] == 42

    def test_required_env_missing(self):
        with pytest.raises(ConfigError):
            load_yaml_text("a: ${MISSING_VAR}", env={})

    def test_nested_default_formula(self):
        # mirrors pipelines/lidar3d-default.yaml:233
        cfg = load_yaml_text(
            "voxel_size: '${RES|$f{max(0.5, min(1.0, 0.015*ESTIMATED_SENSOR_MAX_RANGE))}}'",
            env={},
        )
        e = Expr(cfg["voxel_size"])
        assert e.vars == {"ESTIMATED_SENSOR_MAX_RANGE"}
        assert float(e({"ESTIMATED_SENSOR_MAX_RANGE": 100.0})) == pytest.approx(1.0)

    def test_constant_formula_folds(self):
        cfg = load_yaml_text("x: $f{2*3+1}", env={})
        assert float(cfg["x"]) == 7.0

    def test_include(self, tmp_path):
        (tmp_path / "inner.yaml").write_text("c: 3\nd: ${E|4}\n")
        (tmp_path / "outer.yaml").write_text("a: 1\nsub: $include{./inner.yaml}\n")
        cfg = load_yaml_file(tmp_path / "outer.yaml", env={})
        assert cfg == {"a": 1, "sub": {"c": 3, "d": 4}}

    def test_reference_pipeline_loads(self):
        # The real reference config must parse end-to-end with defaults.
        cfg = load_yaml_file("/root/reference/pipelines/lidar3d-default.yaml", env={})
        assert cfg["params"]["min_icp_goodness"] == pytest.approx(0.25)
        assert cfg["icp_settings_with_vel"]["params"]["maxIterations"] == 300
        m = cfg["icp_settings_with_vel"]["matchers"][0]
        assert m["class"].endswith("Matcher_Points_DistanceThreshold")
        assert "ADAPTIVE_THRESHOLD_SIGMA" in m["params"]["threshold"]

    def test_helpers(self):
        assert as_bool("true") and not as_bool("${X|false}".replace("${X|", "").replace("}", ""))
        assert as_float("1.2*2") == pytest.approx(2.4)
        assert as_bool(None, default=True)
