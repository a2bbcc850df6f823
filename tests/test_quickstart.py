"""The one-command acceptance drive (tools/quickstart.py).

Runs the REAL script — synthetic store -> fsck -> 2-epoch CLI train ->
challenge-retarget inference -> .fvtserve export -> HTTP serve (logits
+ streamed session) -> summarize_runs — as a subprocess, asserting the
all-stages-passed line.  This is the product-level gate: if it passes,
a user can run the whole journey in this image today.

Cost: ~5-8 min on CPU (dominated by jit compiles; the CLI's persistent
compilation cache makes warm runs cheaper).  Opt out in constrained
environments with FVT_SKIP_QUICKSTART=1.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(os.environ.get('FVT_SKIP_QUICKSTART') == '1',
                    reason='FVT_SKIP_QUICKSTART=1')
def test_quickstart_all_stages(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'quickstart.py'),
         '--workdir', str(tmp_path / 'qs')],
        capture_output=True, text=True, timeout=1500,
        env=dict(os.environ, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert 'quickstart OK — all 7 stages passed' in r.stdout, \
        r.stdout[-2000:]
