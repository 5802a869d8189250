"""Pure, vectorizable kernels used inside map_batches stages."""
