/* Shim: the reference includes <vector_types.h> for float3/uchar4
 * (include/raymarcher.h:4); everything lives in the cuda_runtime shim. */
#include <cuda_runtime.h>
