// Batched warehouse engine in C++ — third implementation of
// docs/SEMANTICS.md (after the NumPy oracle and the JAX engine).
//
// Role (SURVEY.md §2.2): the host-side native runtime counterpart of the
// reference stack's C++ layer (Ray core) — here it serves as (a) a mass
// parity-fuzzing engine: millions of CPU env-steps cross-checked
// bit-exactly against the JAX engine, and (b) a fast host-side fallback
// stepping path. Randomness is INJECTED per step (spawn_u/pick/drop),
// mirroring the oracle's pluggable DrawSource, so dynamics stay pure and
// the draw stream lives in one place (warehouse_tpu/rng.py).
//
// Build: `make -C warehouse_tpu/native` → libwarehouse.so (ctypes).

#include <cstdint>
#include <cstring>

namespace {

constexpr int EMPTY = 0, PENDING = 1, IN_TRANSIT = 2;
constexpr int kDeltas[5][2] = {{0, 0}, {-1, 0}, {1, 0}, {0, -1}, {0, 1}};
// move()/step_one() use stack scratch sized for kMaxAgents; wh_step_batch
// rejects A outside [1, kMaxAgents] (driver configs top out at A=8,
// BASELINE.md; the Python binding raises on a nonzero status).
constexpr int kMaxAgents = 64;

struct Env {
  int A, R, H, W;
  const uint8_t* walls;  // [H*W] 1 = blocked (docs/SEMANTICS.md §1a)
  int32_t* pos;      // [A,2]
  int32_t* areq;     // [A]
  uint8_t* carry;    // [A]
  int32_t* rpick;    // [R,2]
  int32_t* rdrop;    // [R,2]
  int32_t* rstat;    // [R]
  int32_t* ragent;   // [R]
};

// docs/SEMANTICS.md §4.1 — mirrors OracleEnv._move rule for rule.
void move(const Env& e, const int32_t* actions, uint8_t* collided,
          int32_t* prop, uint8_t* moving) {
  const int A = e.A;
  for (int i = 0; i < A; ++i) {
    prop[2 * i] = e.pos[2 * i] + kDeltas[actions[i]][0];
    prop[2 * i + 1] = e.pos[2 * i + 1] + kDeltas[actions[i]][1];
    moving[i] = actions[i] != 0;
    collided[i] = 0;
  }
  // Rule 1: bounds + walls.
  for (int i = 0; i < A; ++i) {
    bool oob = prop[2 * i] < 0 || prop[2 * i] >= e.H ||
               prop[2 * i + 1] < 0 || prop[2 * i + 1] >= e.W;
    bool wall = !oob && e.walls != nullptr &&
                e.walls[prop[2 * i] * e.W + prop[2 * i + 1]];
    if (moving[i] && (oob || wall)) {
      prop[2 * i] = e.pos[2 * i];
      prop[2 * i + 1] = e.pos[2 * i + 1];
      moving[i] = 0;
      collided[i] = 1;
    }
  }
  // Rule 2: same target — lowest index wins.
  for (int i = 0; i < A; ++i) {
    if (!moving[i]) continue;
    for (int j = 0; j < i; ++j) {
      if (moving[j] && prop[2 * j] == prop[2 * i] &&
          prop[2 * j + 1] == prop[2 * i + 1]) {
        prop[2 * i] = e.pos[2 * i];
        prop[2 * i + 1] = e.pos[2 * i + 1];
        moving[i] = 0;
        collided[i] = 1;
        break;
      }
    }
  }
  // Rule 3: swaps — both revert.
  bool swap[kMaxAgents] = {false};
  for (int i = 0; i < A; ++i) {
    for (int j = i + 1; j < A; ++j) {
      if (moving[i] && moving[j] && prop[2 * i] == e.pos[2 * j] &&
          prop[2 * i + 1] == e.pos[2 * j + 1] &&
          prop[2 * j] == e.pos[2 * i] &&
          prop[2 * j + 1] == e.pos[2 * i + 1]) {
        swap[i] = swap[j] = true;
      }
    }
  }
  for (int i = 0; i < A; ++i) {
    if (swap[i]) {
      prop[2 * i] = e.pos[2 * i];
      prop[2 * i + 1] = e.pos[2 * i + 1];
      moving[i] = 0;
      collided[i] = 1;
    }
  }
  // Rule 4: blocked-cell fixed point (≤ A iterations).
  for (int it = 0; it < A; ++it) {
    bool changed = false;
    for (int i = 0; i < A; ++i) {
      if (!moving[i]) continue;
      for (int j = 0; j < A; ++j) {
        if (j != i && !moving[j] && prop[2 * i] == prop[2 * j] &&
            prop[2 * i + 1] == prop[2 * j + 1]) {
          prop[2 * i] = e.pos[2 * i];
          prop[2 * i + 1] = e.pos[2 * i + 1];
          moving[i] = 0;
          collided[i] = 1;
          changed = true;
          break;
        }
      }
    }
    if (!changed) break;
  }
  std::memcpy(e.pos, prop, sizeof(int32_t) * 2 * A);
}

// §7 assignment — mirrors OracleEnv._assign.
void assign(const Env& e) {
  for (int i = 0; i < e.A; ++i) {
    if (e.areq[i] >= 0) continue;
    int best_r = -1;
    int best_d = 0;
    for (int r = 0; r < e.R; ++r) {
      if (e.rstat[r] != PENDING || e.ragent[r] >= 0) continue;
      int d = 0;
      int dr = e.pos[2 * i] - e.rpick[2 * r];
      int dc = e.pos[2 * i + 1] - e.rpick[2 * r + 1];
      d = (dr < 0 ? -dr : dr) + (dc < 0 ? -dc : dc);
      if (best_r < 0 || d < best_d) {  // ties: lowest r wins
        best_r = r;
        best_d = d;
      }
    }
    if (best_r >= 0) {
      e.areq[i] = best_r;
      e.ragent[best_r] = i;
    }
  }
}

void step_one(const Env& e, const int32_t* actions, float spawn_u,
              int32_t spawn_pick, int32_t spawn_drop, float spawn_prob,
              float step_penalty, float pickup_reward,
              float delivery_reward, float collision_penalty,
              float* rewards, uint8_t* picked, uint8_t* delivered,
              uint8_t* collided) {
  int32_t prop[2 * kMaxAgents];
  uint8_t moving[kMaxAgents];
  move(e, actions, collided, prop, moving);

  // §5 pickup.
  for (int i = 0; i < e.A; ++i) {
    picked[i] = 0;
    int r = e.areq[i];
    if (r >= 0 && !e.carry[i] && e.rstat[r] == PENDING &&
        e.pos[2 * i] == e.rpick[2 * r] &&
        e.pos[2 * i + 1] == e.rpick[2 * r + 1]) {
      e.carry[i] = 1;
      e.rstat[r] = IN_TRANSIT;
      picked[i] = 1;
    }
  }
  // §5 delivery.
  for (int i = 0; i < e.A; ++i) {
    delivered[i] = 0;
    int r = e.areq[i];
    if (r >= 0 && e.carry[i] && e.pos[2 * i] == e.rdrop[2 * r] &&
        e.pos[2 * i + 1] == e.rdrop[2 * r + 1]) {
      e.rstat[r] = EMPTY;
      e.ragent[r] = -1;
      e.rpick[2 * r] = e.rpick[2 * r + 1] = 0;
      e.rdrop[2 * r] = e.rdrop[2 * r + 1] = 0;
      e.areq[i] = -1;
      e.carry[i] = 0;
      delivered[i] = 1;
    }
  }
  // §6 spawn.
  if (spawn_u < spawn_prob) {
    for (int r = 0; r < e.R; ++r) {
      if (e.rstat[r] == EMPTY) {
        e.rpick[2 * r] = spawn_pick / e.W;
        e.rpick[2 * r + 1] = spawn_pick % e.W;
        e.rdrop[2 * r] = spawn_drop / e.W;
        e.rdrop[2 * r + 1] = spawn_drop % e.W;
        e.rstat[r] = PENDING;
        e.ragent[r] = -1;
        break;
      }
    }
  }
  // §7 assignment.
  assign(e);
  // §8 rewards — float32 chain identical to oracle/engine.
  for (int i = 0; i < e.A; ++i) {
    rewards[i] = step_penalty + pickup_reward * (float)picked[i] +
                 delivery_reward * (float)delivered[i] +
                 collision_penalty * (float)collided[i];
  }
}

}  // namespace

extern "C" {

// Step B envs in place. All arrays are C-contiguous with the batch as
// the leading axis; shapes in the comments. Returns 0 on success,
// -1 if A is outside [1, kMaxAgents] (stack scratch bound) or B/R/H/W
// are non-positive — state is untouched on error.
int32_t wh_step_batch(
    int B, int A, int R, int H, int W,
    int32_t* agent_pos,        // [B,A,2]
    int32_t* agent_req,        // [B,A]
    uint8_t* carrying,         // [B,A]
    int32_t* req_pickup,       // [B,R,2]
    int32_t* req_drop,         // [B,R,2]
    int32_t* req_status,       // [B,R]
    int32_t* req_agent,        // [B,R]
    int32_t* t,                // [B]
    const uint8_t* walls,      // [H*W], may be null
    const int32_t* actions,    // [B,A]
    const float* spawn_u,      // [B]
    const int32_t* spawn_pick, // [B]
    const int32_t* spawn_drop, // [B]
    float spawn_prob, float step_penalty, float pickup_reward,
    float delivery_reward, float collision_penalty,
    float* rewards,            // [B,A]
    uint8_t* picked,           // [B,A]
    uint8_t* delivered,        // [B,A]
    uint8_t* collided) {       // [B,A]
  if (A < 1 || A > kMaxAgents || B < 0 || R < 1 || H < 1 || W < 1) {
    return -1;
  }
  for (int b = 0; b < B; ++b) {
    Env e{A, R, H, W, walls,
          agent_pos + (size_t)b * A * 2,
          agent_req + (size_t)b * A,
          carrying + (size_t)b * A,
          req_pickup + (size_t)b * R * 2,
          req_drop + (size_t)b * R * 2,
          req_status + (size_t)b * R,
          req_agent + (size_t)b * R};
    step_one(e, actions + (size_t)b * A, spawn_u[b], spawn_pick[b],
             spawn_drop[b], spawn_prob, step_penalty, pickup_reward,
             delivery_reward, collision_penalty,
             rewards + (size_t)b * A, picked + (size_t)b * A,
             delivered + (size_t)b * A, collided + (size_t)b * A);
    t[b] += 1;
  }
  return 0;
}

// Greedy nearest-request baseline (docs/SEMANTICS.md §12), batched.
void wh_greedy_batch(
    int B, int A, int R,
    const int32_t* agent_pos,  // [B,A,2]
    const int32_t* agent_req,  // [B,A]
    const uint8_t* carrying,   // [B,A]
    const int32_t* req_pickup, // [B,R,2]
    const int32_t* req_drop,   // [B,R,2]
    int32_t* actions) {        // [B,A] out
  for (int b = 0; b < B; ++b) {
    const int32_t* pos = agent_pos + (size_t)b * A * 2;
    const int32_t* areq = agent_req + (size_t)b * A;
    const uint8_t* carry = carrying + (size_t)b * A;
    const int32_t* rp = req_pickup + (size_t)b * R * 2;
    const int32_t* rd = req_drop + (size_t)b * R * 2;
    int32_t* act = actions + (size_t)b * A;
    for (int i = 0; i < A; ++i) {
      int r = areq[i];
      if (r < 0) {
        act[i] = 0;
        continue;
      }
      const int32_t* tgt = carry[i] ? rd + 2 * r : rp + 2 * r;
      int drow = tgt[0] - pos[2 * i];
      int dcol = tgt[1] - pos[2 * i + 1];
      if (drow != 0)
        act[i] = drow < 0 ? 1 : 2;  // UP : DOWN
      else if (dcol != 0)
        act[i] = dcol < 0 ? 3 : 4;  // LEFT : RIGHT
      else
        act[i] = 0;
    }
  }
}

}  // extern "C"
