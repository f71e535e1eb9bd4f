"""Keep the conftest SMOKE selection honest: every listed node id must still
exist, so a rename can't silently shrink the <5-min green check."""
import importlib
import re

import pytest

from tests.conftest import SMOKE


@pytest.mark.smoke
def test_smoke_list_resolves():
    for nid in sorted(SMOKE):
        fname, rest = nid.split("::", 1)
        mod = importlib.import_module("tests." + fname[:-3])
        obj = mod
        for part in rest.split("::"):
            name = re.sub(r"\[.*\]$", "", part)
            assert hasattr(obj, name), f"SMOKE entry is stale: {nid}"
            obj = getattr(obj, name)
