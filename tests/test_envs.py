"""Central VPC_* env registry (reference vllm/envs.py:1-482 analog):
lazy getters see post-import environment changes; unknown names raise."""

import pytest


def test_defaults():
    from vllm_paged_compression_tpu import envs
    assert envs.VPC_ATTENTION_BACKEND == "auto"
    assert envs.VPC_ACTIVATION_HEADROOM_MB == 1024
    assert envs.VPC_HBM_GIB is None
    assert envs.VPC_HTTP_READ_TIMEOUT == 300.0
    assert envs.VPC_WINDOW_CHAIN is False


def test_lazy_reads_environment(monkeypatch):
    from vllm_paged_compression_tpu import envs
    monkeypatch.setenv("VPC_HBM_GIB", "32.5")
    assert envs.VPC_HBM_GIB == 32.5
    monkeypatch.setenv("VPC_MULTIHOST_CHECK", "1")
    assert envs.VPC_MULTIHOST_CHECK is True
    monkeypatch.setenv("VPC_MULTIHOST_CHECK", "0")
    assert envs.VPC_MULTIHOST_CHECK is False


def test_unknown_name_raises():
    from vllm_paged_compression_tpu import envs
    with pytest.raises(AttributeError):
        envs.VPC_NO_SUCH_KNOB
    assert "VPC_ATTENTION_BACKEND" in dir(envs)


def test_every_var_in_module_doc():
    """The registry is also the documentation: every knob appears in the
    module docstring table."""
    from vllm_paged_compression_tpu import envs
    for name in envs.environment_variables:
        assert name in envs.__doc__, name
