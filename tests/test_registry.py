import pytest

from torchok_tpu.constructor.registry import Registry


def test_register_and_get():
    r = Registry("test")

    @r.register_class
    class Foo:
        pass

    assert r.get("Foo") is Foo
    assert "Foo" in r
    assert len(r) == 1


def test_duplicate_rejected():
    r = Registry("test")
    r.register_class(type("A", (), {}), name="A")
    with pytest.raises(KeyError):
        r.register_class(type("A2", (), {}), name="A")


def test_missing_key_suggestions():
    r = Registry("test")
    r.register_class(type("ResNet18", (), {}), name="resnet18")
    with pytest.raises(KeyError, match="resnet18"):
        r.get("resnet")


def test_list_models_wildcards():
    r = Registry("test")
    for n in ["resnet18", "resnet50", "vit_base", "resnet101"]:
        r.register_class(type(n, (), {}), name=n)
    assert r.list_models("resnet*") == ["resnet18", "resnet50", "resnet101"]
    assert r.list_models("resnet*", exclude_filters="*50") == ["resnet18", "resnet101"]
    assert r.list_models() == ["resnet18", "resnet50", "resnet101", "vit_base"]
