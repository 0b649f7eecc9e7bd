"""Pure-Python per-document extraction core (no Spark imports).

Ships to executors via --py-files; every function here is called from inside
Arrow-batched UDFs, one batch of documents per Python invocation.
"""
