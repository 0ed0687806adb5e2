# Parity-evidence tools that deliberately share NO code with the
# tracer_tpu package (see verify/ref_estimator_numpy.py).
