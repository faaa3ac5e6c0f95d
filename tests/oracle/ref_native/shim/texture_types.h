/* Shim: the reference includes <texture_types.h> for cudaTextureObject_t
 * (include/raymarcher.h:5); everything lives in the cuda_runtime shim. */
#include <cuda_runtime.h>
