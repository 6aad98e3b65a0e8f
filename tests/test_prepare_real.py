"""tools/prepare_real.py end-to-end: the fixture self-test must validate
every fabricated upstream layout through its real recipe config and emit the
north-star runbook (VERDICT r3 #9)."""
import os
import subprocess
import sys


def test_prepare_real_selftest():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "prepare_real.py"),
         "--selftest"],
        capture_output=True, text=True, timeout=600, cwd=repo, env=env)
    out = p.stdout
    assert p.returncode == 0, p.stdout + p.stderr
    for label in ("ZINC-subset", "PCQM4Mv2", "Peptides-functional",
                  "Peptides-structural", "VOCSuperpixels", "COCOSuperpixels",
                  "ogbg-molhiv", "PATTERN"):
        assert f"[ok]   {label}" in out, f"{label} did not validate:\n{out}"
    assert "0 failed" in out
    assert "NORTH-STAR ACCURACY GATES" in out
    assert "zinc-GPS+RWSE.yaml" in out and "pcqm4m-GPSmedium+RWSE.yaml" in out
