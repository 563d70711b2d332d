"""Canonical fixture paths for the test suite.

All tests consume the VENDORED fixtures under ``data/`` (regenerated,
schema-conformant sample data — tools/generate_sample_data.py /
create_record.py), so the suite is self-contained: it stays green with the
``/root/reference`` mount renamed or absent.  The reference mount is used
ONLY by explicitly-optional parity checks via :func:`ref_data`, which
returns ``None`` when the mount is gone (callers skip).

Reference anchor: the reference ran its unit suite against an in-repo
10-row fixture (reference python/wide_deep_test.py:18, data/test/test2);
the vendored ``UNIT_FIXTURE`` is this repo's regenerated analog (same
61-column schema, multivalue cells, '-' missing markers).
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")

# 10-row unit fixture (reference data/test/test2 analog)
UNIT_FIXTURE = os.path.join(DATA, "test", "test2")
# 2000-row training sample with a planted CTR signal
TRAIN1 = os.path.join(DATA, "train", "train1")
# 200-row label-less prediction sample
PRED1 = os.path.join(DATA, "pred", "pred1")
# 24-image TFRecord sample (tools/create_record.py)
IMAGE_TFRECORDS = os.path.join(DATA, "image", "train.tfrecords")

_REF_DATA = "/root/reference/data"


def ref_data(*rel):
    """Reference-mount path for OPTIONAL parity tests; None if the mount
    is absent (callers must skip, never fail)."""
    p = os.path.join(_REF_DATA, *rel)
    return p if os.path.exists(p) else None
