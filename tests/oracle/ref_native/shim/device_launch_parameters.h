/* Shim: the reference kernel includes <device_launch_parameters.h> for the
 * thread-coordinate builtins (src/raymarcher.cu:2); they are declared in
 * the cuda_runtime shim. */
#include <cuda_runtime.h>
