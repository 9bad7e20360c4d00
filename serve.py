#!/usr/bin/env python
"""Generation-serving CLI: a long-lived HTTP service over the fused CLaSS
sampler (no reference counterpart — the reference only ships the batch
job, sample_pipeline.py:236-326; this serves the same machinery).

    python serve.py --runname myrun --Q_select_amppos 1 --port 8800

then:

    curl -s localhost:8800/healthz
    curl -s -X POST localhost:8800/generate -d '{"n": 25}'
    curl -s localhost:8800/stats

Flags are sample_pipeline.py's (Q fit, round size) plus --host/--port.
Concurrent requests are coalesced into shared fused rounds; every served
peptide is unique for the server's lifetime (see
controlled_peptide_generation_tpu/serve.py).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from controlled_peptide_generation_tpu import config as C  # noqa: E402
from controlled_peptide_generation_tpu.utils import runtime as _rt  # noqa: E402
_rt.setup()
from controlled_peptide_generation_tpu import serve as S  # noqa: E402

logging.basicConfig(
    format="%(asctime)s %(message)s",
    datefmt="%m/%d/%Y %I:%M:%S %p",
    level=logging.INFO)

EXTRA_ARGS = [
    ("--QClass", dict(default="mogQ")),
    ("--Q_n_components", dict(type=int, default=100,
                              help="mog num components for Q model")),
    ("--Q_covariance_type", dict(default="diag",
                                 help="mog Q covariance type full|tied|diag")),
    ("--n_samples_per_round", dict(type=int, default=5000,
                                   help="candidates per fused round")),
    ("--Q_select_amppos", dict(type=int, default=0,
                               help="fit Q_xi on amp-positive selection")),
    ("--host", dict(default="127.0.0.1", help="bind address")),
    ("--port", dict(type=int, default=8800, help="bind port")),
    ("--max_n", dict(type=int, default=100_000,
                     help="largest n a single /generate may request")),
]


def main(argv=None):
    cfg, args, _ = C.parse_and_finalize(argv, extra_args=EXTRA_ARGS)
    C.pretty_print(cfg)
    server = S.build_server(cfg, args).start()
    httpd = S.make_http_server(server, host=args.host, port=args.port,
                               max_n=args.max_n)
    logging.info("Serving on http://%s:%d (POST /generate, GET /healthz, "
                 "GET /stats)", args.host, args.port)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.stop()


if __name__ == "__main__":
    main()
