"""One-grant batch runner: r3t step bisection + direct MXU A/B."""
import runpy

print("===== profile_r3t =====", flush=True)
runpy.run_path("/root/repo/scripts/profile_r3t.py", run_name="__main__")
print("===== profile_direct_mxu =====", flush=True)
runpy.run_path("/root/repo/scripts/profile_direct_mxu.py", run_name="__main__")
