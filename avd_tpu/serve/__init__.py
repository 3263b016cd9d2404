"""HTTP serving: micro-framework, routes, pre-fork master, batching queue.

The reference serves FastAPI under Gunicorn/UvicornWorker
(/root/reference/api.py, gunicorn_conf.py).  This package reproduces the
full HTTP surface — 8 routes, CORS, multipart streaming, error mapping with
the reference's Italian messages — on the Python stdlib (no FastAPI
dependency in the TPU image), plus a pre-fork worker master with
max-requests recycling equivalent to the reference's Gunicorn config.
"""
