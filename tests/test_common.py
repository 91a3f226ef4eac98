"""Tests for the config/tuning core (parity with reference test/common/)."""

import pytest

from neural_compressor_tpu.common import (
    BaseConfig,
    ComposableConfig,
    ConfigLoader,
    ConfigSet,
    SequentialSampler,
    TuningConfig,
    TuningMonitor,
    init_tuning,
    register_config,
    config_registry,
    Statistics,
    options,
)


class FakeConfig(BaseConfig):
    name = "fake"
    params_list = ("bits", "group_size")

    def __init__(self, bits=4, group_size=32, white_list="*"):
        super().__init__(white_list=white_list)
        self.bits = bits
        self.group_size = group_size

    @classmethod
    def supported_op_types(cls):
        return ("Linear", "Einsum")


class OtherConfig(BaseConfig):
    name = "other"
    params_list = ("alpha",)

    def __init__(self, alpha=0.5, white_list="*"):
        super().__init__(white_list=white_list)
        self.alpha = alpha


MODEL_INFO = [
    ("blocks.0.attn.q_proj", "Linear"),
    ("blocks.0.mlp.up_proj", "Linear"),
    ("lm_head", "Linear"),
    ("blocks.0.norm", "RMSNorm"),
]


class TestConfig:
    def test_expand_cartesian(self):
        cfg = FakeConfig(bits=[4, 8], group_size=[32, 64, 128])
        expanded = cfg.expand()
        assert len(expanded) == 6
        combos = {(c.bits, c.group_size) for c in expanded}
        assert (4, 32) in combos and (8, 128) in combos

    def test_expand_scalar_is_identity(self):
        cfg = FakeConfig(bits=4, group_size=32)
        assert len(cfg.expand()) == 1

    # tuning-dimension type validation (reference pydantic-checks these:
    # common/tuning_param.py:108-128)
    def test_expand_rejects_str_for_int_param(self):
        with pytest.raises(ValueError, match="group_size"):
            FakeConfig(bits=4, group_size="128").expand()

    def test_expand_rejects_malformed_candidate(self):
        with pytest.raises(ValueError, match="tuning candidate"):
            FakeConfig(bits=[4, "eight"], group_size=32).expand()

    def test_expand_rejects_bool_for_int_param(self):
        with pytest.raises(ValueError, match="bits"):
            FakeConfig(bits=True).expand()

    def test_expand_rejects_empty_tuning_list(self):
        with pytest.raises(ValueError, match="empty tuning list"):
            FakeConfig(bits=[]).expand()

    def test_expand_accepts_int_where_float_expected(self):
        cfgs = OtherConfig(alpha=[0, 1]).expand()  # float param, int cands
        assert [c.alpha for c in cfgs] == [0, 1]

    def test_real_config_validation(self):
        import neural_compressor_tpu as nq

        with pytest.raises(ValueError, match="use_sym"):
            nq.RTNConfig(use_sym="yes").expand()
        with pytest.raises(ValueError, match="dtype"):
            nq.GPTQConfig(dtype=[4, 8]).expand()  # dtype is a str param
        # the documented tuning form still works
        assert len(nq.RTNConfig(dtype=["int4", "int8"]).expand()) == 2

    def test_to_config_mapping_global(self):
        cfg = FakeConfig(bits=4)
        mapping = cfg.to_config_mapping(MODEL_INFO)
        assert ("blocks.0.attn.q_proj", "Linear") in mapping
        assert ("blocks.0.norm", "RMSNorm") not in mapping
        assert len(mapping) == 3

    def test_local_override_by_name_regex(self):
        cfg = FakeConfig(bits=4)
        cfg.set_local("lm_head", FakeConfig(bits=8))
        mapping = cfg.to_config_mapping(MODEL_INFO)
        assert mapping[("lm_head", "Linear")].bits == 8
        assert mapping[("blocks.0.attn.q_proj", "Linear")].bits == 4

    def test_local_override_by_pattern(self):
        cfg = FakeConfig(bits=4)
        cfg.set_local(r".*mlp.*", FakeConfig(bits=2))
        mapping = cfg.to_config_mapping(MODEL_INFO)
        assert mapping[("blocks.0.mlp.up_proj", "Linear")].bits == 2

    def test_white_list_restricts(self):
        cfg = FakeConfig(bits=4, white_list=[r".*attn.*"])
        mapping = cfg.to_config_mapping(MODEL_INFO)
        assert len(mapping) == 1

    def test_to_from_dict_roundtrip(self):
        cfg = FakeConfig(bits=4, group_size=64)
        cfg.set_local("lm_head", FakeConfig(bits=8))
        d = cfg.to_dict()
        cfg2 = FakeConfig.from_dict(d)
        assert cfg2.to_dict() == d

    def test_composable(self):
        combined = FakeConfig(bits=4) + OtherConfig(alpha=0.7)
        assert isinstance(combined, ComposableConfig)
        assert len(combined.config_list) == 2
        mapping = combined.to_config_mapping(MODEL_INFO)
        assert len(mapping) == 3

    def test_composable_expand(self):
        combined = FakeConfig(bits=[4, 8], group_size=32) + OtherConfig(alpha=[0.3, 0.5])
        assert len(combined.expand()) == 4

    def test_registry(self):
        @register_config("unit_test_algo", priority=99)
        class UTConfig(BaseConfig):
            def __init__(self):
                super().__init__()

        assert config_registry.get_config_cls_by_name("unit_test_algo") is UTConfig
        sorted_names = [n for n, _ in config_registry.get_sorted_configs()]
        assert sorted_names[0] == "unit_test_algo"


class TestTuning:
    def test_config_loader_iterates_expanded(self):
        loader = ConfigLoader(FakeConfig(bits=[4, 8]))
        assert len(list(loader)) == 2

    def test_monitor_stop_on_goal(self):
        tcfg = TuningConfig(config_set=FakeConfig(bits=[4, 8]), tolerable_loss=0.01,
                            max_trials=10)
        loader, tlogger, monitor = init_tuning(tcfg)
        monitor.set_baseline(1.0)
        monitor.add_trial_result(1, 0.995, FakeConfig(bits=4))
        assert monitor.need_stop()

    def test_monitor_stop_on_max_trials(self):
        tcfg = TuningConfig(config_set=FakeConfig(bits=[4, 8]), tolerable_loss=0.0,
                            max_trials=2)
        _, _, monitor = init_tuning(tcfg)
        monitor.set_baseline(1.0)
        monitor.add_trial_result(1, 0.5, FakeConfig(bits=4))
        assert not monitor.need_stop()
        monitor.add_trial_result(2, 0.6, FakeConfig(bits=8))
        assert monitor.need_stop()
        assert monitor.get_best_trial_record().trial_result == 0.6

    def test_sampler(self):
        cs = ConfigSet.from_fwk_configs([FakeConfig(bits=[4, 8]), OtherConfig()])
        assert len(cs) == 3
        assert list(SequentialSampler(cs)) == [0, 1, 2]


class TestUtility:
    def test_statistics_renders(self):
        s = Statistics([["Linear", 10], ["Einsum", 2]], header="ops",
                       field_names=["type", "count"])
        text = str(s)
        assert "Linear" in text and "count" in text

    def test_options_seed(self):
        options.random_seed = 42
        assert options.random_seed == 42


class TestConfigMatching:
    """Pattern/white_list semantics fixed in round 2."""

    def test_string_white_list_not_char_iterated(self):
        from neural_compressor_tpu.common.config import BaseConfig

        class C(BaseConfig):
            params_list = ()

        cfg = C(white_list="lm_head")
        info = [("lm_head", "Linear"),
                ("model.layers.0.self_attn.q_proj", "Linear")]
        mapping = cfg.to_config_mapping(info)
        assert list(mapping) == [("lm_head", "Linear")]

    def test_star_in_list_means_no_filter(self):
        from neural_compressor_tpu.common.config import BaseConfig

        class C(BaseConfig):
            params_list = ()

        mapping = C(white_list=["*"]).to_config_mapping(
            [("a.b", "Linear"), ("c.d", "Linear")])
        assert len(mapping) == 2

    def test_segment_boundary_match(self):
        from neural_compressor_tpu.common.config import BaseConfig

        class C(BaseConfig):
            params_list = ()

        cfg = C()
        # "layers.1" must match layer 1's subtree but not layers.10+
        assert cfg._match("layers.1", "model.layers.1.mlp.up_proj", "Linear")
        assert not cfg._match("layers.1", "model.layers.10.mlp.up_proj",
                              "Linear")
        assert cfg._match("self_attn.q_proj",
                          "model.layers.3.self_attn.q_proj", "Linear")

    def test_identity_distinguishes_white_list(self):
        import neural_compressor_tpu as nq

        a = nq.RTNConfig(bits=4, white_list=["attn"])
        b = nq.RTNConfig(bits=4, white_list=["mlp"])
        assert a != b
        assert a.identity_json() != b.identity_json()
        # composable identity keeps same-algorithm members apart
        c1 = nq.RTNConfig(dtype="int4") + nq.RTNConfig(dtype="int8")
        c2 = nq.RTNConfig(dtype="int8") + nq.RTNConfig(dtype="int8")
        assert c1 != c2


class TestTuningRobustness:
    def test_nan_trial_does_not_win(self):
        from neural_compressor_tpu.common.tuning import (TuningConfig,
                                                         TuningMonitor)
        import neural_compressor_tpu as nq

        mon = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon.add_trial_result(1, float("nan"), nq.RTNConfig(dtype="int4"))
        mon.add_trial_result(2, 0.99, nq.RTNConfig(dtype="int8"))
        best = mon.get_best_trial_record()
        assert best.trial_result == 0.99

    def test_resume_retries_failed_trials(self, tmp_path):
        from neural_compressor_tpu.common.tuning import (TuningConfig,
                                                         TuningMonitor)
        import neural_compressor_tpu as nq

        cfg = nq.RTNConfig(dtype="int4")
        mon = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon.attach_workspace(str(tmp_path))
        mon.add_trial_result(1, float("-inf"), cfg)
        mon2 = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon2.attach_workspace(str(tmp_path), resume=True)
        assert mon2.lookup_resumed(cfg) is None  # failed -> retry

    def test_persist_merges_resumed(self, tmp_path):
        from neural_compressor_tpu.common.tuning import (TuningConfig,
                                                         TuningMonitor)
        import neural_compressor_tpu as nq

        a = nq.RTNConfig(dtype="int4")
        b = nq.RTNConfig(dtype="int8")
        mon = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon.attach_workspace(str(tmp_path))
        mon.add_trial_result(1, 0.5, a)
        mon.add_trial_result(2, 0.7, b)
        # session 2: resumes, re-records only `a`, then "dies"
        mon2 = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon2.attach_workspace(str(tmp_path), resume=True)
        mon2.add_trial_result(1, 0.5, a)
        # session 3 must still see BOTH results
        mon3 = TuningMonitor(TuningConfig(config_set=[], max_trials=5))
        mon3.attach_workspace(str(tmp_path), resume=True)
        assert mon3.lookup_resumed(a) == 0.5
        assert mon3.lookup_resumed(b) == 0.7
