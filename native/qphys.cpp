// qphys — standalone C++ oracle of the Quake 1 player-movement physics.
//
// Role: the reference project validates its Python simulation against the
// real game engine (a modified quakespasm C server run in lockstep).  The
// game engine itself cannot run headless in this environment, so this
// library serves the same ground-truth role: an independent, scalar,
// from-the-spec C++ implementation of the movement physics
// (sv_user.c:SV_AirMove/SV_UserFriction/SV_Accelerate/SV_AirAccelerate,
// sv_phys.c:SV_AddGravity, client.qc:PlayerJump semantics) used to
// triangulate the JAX implementation from a third, non-NumPy codebase.
//
// All arithmetic is float32 (like the engine); z position is float64 to
// match the framework's parity-mode state (see q1physrl_tpu/phys.py).
// Exposed via a C ABI for ctypes.

#include <cmath>
#include <cstdint>

namespace {

constexpr float kMaxSpeed = 320.0f;
constexpr float kAccelerate = 10.0f;
constexpr float kFriction = 4.0f;
constexpr float kStopSpeed = 100.0f;
constexpr float kJumpSpeed = 270.0f;
constexpr float kGravity = 800.0f;
constexpr float kFloorHeight = 24.03125f;  // 24 + DIST_EPSILON
constexpr double kDegToRad = 3.14159265358979323846 / 180.0;

struct Basis {
  float fx, fy, rx, ry;  // forward/right, z row dropped
};

// mathlib.c:AngleVectors, z components dropped.
Basis AngleVectors(float yaw, float pitch, float roll) {
  const float sy = std::sin(static_cast<float>(yaw * kDegToRad));
  const float cy = std::cos(static_cast<float>(yaw * kDegToRad));
  const float sp = std::sin(static_cast<float>(pitch * kDegToRad));
  const float cp = std::cos(static_cast<float>(pitch * kDegToRad));
  const float sr = std::sin(static_cast<float>(roll * kDegToRad));
  const float cr = std::cos(static_cast<float>(roll * kDegToRad));
  return Basis{cp * cy, cp * sy,
               -sr * sp * cy + cr * sy,
               -sr * sp * sy - cr * cy};
}

}  // namespace

extern "C" {

// Advance n players one frame, in place.  SoA layout matching
// q1physrl_tpu.phys.PlayerState / Inputs.
void qphys_apply(int n,
                 const float* yaw, const float* pitch, const float* roll,
                 const float* fmove, const float* smove,
                 const uint8_t* button2, const float* time_delta,
                 double* z_pos, float* vel_x, float* vel_y, float* vel_z,
                 uint8_t* on_ground, uint8_t* jump_released) {
  for (int i = 0; i < n; ++i) {
    const float dt = time_delta[i];

    // --- SV_AirMove (horizontal), using the pre-step on_ground flag.
    const Basis b = AngleVectors(yaw[i], pitch[i], roll[i]);
    const float wish_x = b.fx * fmove[i] + b.rx * smove[i];
    const float wish_y = b.fy * fmove[i] + b.ry * smove[i];
    const float unclipped = std::sqrt(wish_x * wish_x + wish_y * wish_y);
    float wish_dir_x = wish_x, wish_dir_y = wish_y;
    if (unclipped > 0.0f) {
      wish_dir_x = wish_x / unclipped;
      wish_dir_y = wish_y / unclipped;
    }
    const float wish_speed = std::min(kMaxSpeed, unclipped);

    float vx = vel_x[i], vy = vel_y[i];
    if (on_ground[i]) {
      // SV_UserFriction.
      const float speed = std::sqrt(vx * vx + vy * vy);
      if (speed > 0.0f) {
        const float control = std::max(speed, kStopSpeed);
        const float new_speed =
            std::max(0.0f, speed - dt * control * kFriction);
        vx *= new_speed / speed;
        vy *= new_speed / speed;
      }
    }

    // SV_Accelerate / SV_AirAccelerate: airborne wish speed clips to 30
    // but the accel cap uses the unclipped wish speed (the strafe-jump
    // exploit core).
    const float current_speed = vx * wish_dir_x + vy * wish_dir_y;
    const float clipped_ws =
        (wish_speed > 30.0f && !on_ground[i]) ? 30.0f : wish_speed;
    const float add_speed = std::max(0.0f, clipped_ws - current_speed);
    const float accel_speed =
        std::min(kAccelerate * dt * wish_speed, add_speed);
    vel_x[i] = vx + accel_speed * wish_dir_x;
    vel_y[i] = vy + accel_speed * wish_dir_y;

    // --- Vertical: PlayerJump latch, SV_AddGravity, single-plane fly-move.
    uint8_t jr = jump_released[i] | static_cast<uint8_t>(!button2[i]);
    const bool do_jump = on_ground[i] && button2[i] && jr;
    float vz = vel_z[i];
    if (do_jump) vz += kJumpSpeed;
    vz -= kGravity * dt;
    double zp = z_pos[i] + static_cast<double>(dt) * vz;
    const bool grounded = zp < kFloorHeight;
    if (grounded) {
      zp = kFloorHeight;
      vz = 0.0f;
    }
    z_pos[i] = zp;
    vel_z[i] = vz;
    on_ground[i] = grounded;
    jump_released[i] = jr;
  }
}

// Roll a single player T frames, recording the trajectory.  Outputs are
// (T,)-arrays of the post-step state.
void qphys_trajectory(int t_steps,
                      const float* yaw, const float* pitch, const float* roll,
                      const float* fmove, const float* smove,
                      const uint8_t* button2, const float* time_delta,
                      double z_pos0, float vx0, float vy0, float vz0,
                      uint8_t on_ground0, uint8_t jump_released0,
                      double* out_z, float* out_vx, float* out_vy,
                      float* out_vz, uint8_t* out_on_ground,
                      uint8_t* out_jump_released) {
  double zp = z_pos0;
  float vx = vx0, vy = vy0, vz = vz0;
  uint8_t og = on_ground0, jr = jump_released0;
  for (int t = 0; t < t_steps; ++t) {
    qphys_apply(1, yaw + t, pitch + t, roll + t, fmove + t, smove + t,
                button2 + t, time_delta + t, &zp, &vx, &vy, &vz, &og, &jr);
    out_z[t] = zp;
    out_vx[t] = vx;
    out_vy[t] = vy;
    out_vz[t] = vz;
    out_on_ground[t] = og;
    out_jump_released[t] = jr;
  }
}

int qphys_abi_version() { return 1; }

}  // extern "C"
