"""Build the native extension in place (no pip, no network).

    python -m controlled_peptide_generation_tpu.native.build
"""

import os
import subprocess
import sys
import sysconfig


def build(verbose=True):
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "_tokenizer.c")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_tokenizer" + ext_suffix)
    include = sysconfig.get_paths()["include"]
    cc = os.environ.get("CC", "gcc")
    cmd = [cc, "-O3", "-shared", "-fPIC", f"-I{include}", src, "-o", out]
    if verbose:
        print(" ".join(cmd))
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from controlled_peptide_generation_tpu import native
    import importlib
    importlib.reload(native)
    assert native.available(), "extension built but not importable"
    print(f"built {path}")
