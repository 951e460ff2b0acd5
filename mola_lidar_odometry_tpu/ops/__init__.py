"""TPU compute kernels: geometry, point buffers, filters, maps, matchers, solvers."""
