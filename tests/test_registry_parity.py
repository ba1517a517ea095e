"""Registry name-parity against the reference checkout.

Scrapes every ``X.register_class`` site in /root/reference/torchok (both the
decorator form and the call form) and asserts the corresponding registry here
covers every name. This is the generalization of
``test_backbone_registry_covers_reference_names`` demanded by round-1 review:
a missing registered name anywhere (the round-1 ``NLLLoss2d`` gap) now fails CI.

Reference registration sites: torchok/constructor/__init__.py defines the
registries; components register across torchok/{losses,metrics,callbacks,
data,models,optim,tasks}/**.
"""
import glob
import os
import re

import pytest

import torchok_tpu  # noqa: F401 — populate registries
from torchok_tpu import constructor as C

REF = "/root/reference/torchok"

# Decorator on a class:  @LOSSES.register_class\nclass Foo
# Decorator on a def:    @BACKBONES.register_class\ndef resnet18
# Call form:             LOSSES.register_class(Foo)
_DECORATOR = re.compile(
    r"@(\w+)\.register_class(?:\([^)]*\))?\s*\n(?:@[\w.()\'\" =,]+\s*\n)*"
    r"(?:class|def)\s+(\w+)")
_CALL = re.compile(r"^\s*(\w+)\.register_class\((\w+)\)", re.M)


def scrape_reference_names():
    names = {}
    for path in glob.glob(REF + "/**/*.py", recursive=True):
        src = open(path).read()
        for registry, name in _DECORATOR.findall(src) + _CALL.findall(src):
            names.setdefault(registry, set()).add(name)
    return names


if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference checkout unavailable", allow_module_level=True)

REF_NAMES = scrape_reference_names()

# Reference registry variable -> ours.  The reference piggybacks detection
# necks onto NECKS; we keep them in a dedicated registry, so NECKS parity is
# checked against the union.
REGISTRY_MAP = {
    "LOSSES": lambda: set(C.LOSSES.list_models()),
    "METRICS": lambda: set(C.METRICS.list_models()),
    "CALLBACKS": lambda: set(C.CALLBACKS.list_models()),
    "TRANSFORMS": lambda: set(C.TRANSFORMS.list_models()),
    "DATASETS": lambda: set(C.DATASETS.list_models()),
    "SAMPLERS": lambda: set(C.SAMPLERS.list_models()),
    "OPTIMIZERS": lambda: set(C.OPTIMIZERS.list_models()),
    "SCHEDULERS": lambda: set(C.SCHEDULERS.list_models()),
    "TASKS": lambda: set(C.TASKS.list_models()),
    "BACKBONES": lambda: set(C.BACKBONES.list_models()),
    "POOLINGS": lambda: set(C.POOLINGS.list_models()),
    "HEADS": lambda: set(C.HEADS.list_models()),
    "NECKS": lambda: set(C.NECKS.list_models())
    | set(C.DETECTION_NECKS.list_models()),
    "DETECTION_NECKS": lambda: set(C.DETECTION_NECKS.list_models()),
}

# mmdet_losses.py registers MM* classes dynamically via a loop variable
# (``LOSSES.register_class(mm_class)``); the scraper sees the variable name.
# The actual MM* names are covered by test_mm_losses_registered below.
REF_NAMES.get("LOSSES", set()).discard("mm_class")

# Reference names with no meaning off-torch; each must still be REGISTERED
# here (as an alias/equivalent) — this set only excludes names from the
# "unknown registry" sanity check below.
KNOWN_REGISTRIES = set(REGISTRY_MAP)


@pytest.mark.parametrize("registry", sorted(k for k in REF_NAMES
                                            if k in KNOWN_REGISTRIES))
def test_registry_covers_reference_names(registry):
    ours = REGISTRY_MAP[registry]()
    missing = sorted(REF_NAMES[registry] - ours)
    assert not missing, (
        f"{registry}: {len(missing)} reference names unregistered: "
        f"{missing[:25]}")


def test_no_unknown_reference_registries():
    unknown = sorted(set(REF_NAMES) - KNOWN_REGISTRIES)
    assert not unknown, f"reference registers into unmapped registries: {unknown}"


def test_mm_losses_registered():
    """The MM* family the reference builds dynamically from mmdet's loss
    registry (mmdet_losses.py:7-12) must be present under the MM-prefixed
    names mmdet ships."""
    ours = set(C.LOSSES.list_models())
    expected = {
        "MMFocalLoss", "MMGIoULoss", "MMIoULoss", "MMDIoULoss", "MMCIoULoss",
        "MML1Loss", "MMSmoothL1Loss", "MMCrossEntropyLoss", "MMMSELoss",
        "MMBalancedL1Loss", "MMGaussianFocalLoss", "MMQualityFocalLoss",
        "MMDistributionFocalLoss", "MMVarifocalLoss", "MMSeesawLoss",
        "MMKnowledgeDistillationKLDivLoss", "MMBoundedIoULoss",
    }
    missing = sorted(expected - ours)
    assert not missing, f"MM losses missing: {missing}"


def test_scrape_found_everything():
    # Guard the scraper itself: the reference registers hundreds of names;
    # a regex regression would silently weaken every test above.
    assert len(REF_NAMES.get("BACKBONES", ())) > 300
    assert len(REF_NAMES.get("TRANSFORMS", ())) > 80
    assert len(REF_NAMES.get("METRICS", ())) > 30
    assert len(REF_NAMES.get("LOSSES", ())) > 25
    assert len(REF_NAMES.get("CALLBACKS", ())) > 10
