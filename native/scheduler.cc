// lantern-tpu native serving runtime: request queue + slot table.
//
// This is the control-plane equivalent of the engine the reference borrows
// from vLLM (SURVEY.md §2.7 "continuous batching / serving engine"): request
// admission, slot assignment, per-request decode bookkeeping (committed
// tokens, verify steps, acceptance sums), and completion draining — all the
// state that must not live in the Python hot loop when thousands of requests
// stream through a serving process.  The TPU compute path stays jitted JAX;
// Python calls into this library between device steps via ctypes.
//
// Thread model: producers (serving frontend) enqueue from any thread;
// the device loop thread calls fill_slots / report_step / drain.  A single
// mutex suffices — operations are O(slots) and the device step (~ms) fully
// hides them.
//
// Build: make -C native   (produces liblantern_sched.so)

#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Request {
  uint64_t uid = 0;
  int32_t prompt_len = 0;
  int32_t max_new = 0;
  uint64_t enqueue_ns = 0;
  // progress
  int32_t n_new = 0;
  int32_t steps = 0;
  int32_t accept_sum = 0;
  bool done = false;
};

struct Scheduler {
  std::mutex mu;
  int32_t num_slots = 0;
  std::deque<uint64_t> queue;                    // waiting uids
  std::vector<int64_t> slots;                    // slot -> uid (-1 empty)
  std::unordered_map<uint64_t, Request> reqs;
  std::deque<uint64_t> finished;                 // completed, undrained
  // counters
  uint64_t total_enqueued = 0;
  uint64_t total_completed = 0;
  uint64_t total_tokens = 0;
  uint64_t total_steps = 0;
  uint64_t total_failed = 0;
};

}  // namespace

extern "C" {

void* lantern_sched_create(int32_t num_slots) {
  auto* s = new Scheduler();
  s->num_slots = num_slots;
  s->slots.assign(num_slots, -1);
  return s;
}

void lantern_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

// Admit a request into the waiting queue.  Rejects (silently drops)
// uids that are already live — a duplicate would occupy two slots but be
// drained once, wedging a slot forever — and uids >= 2^63, which the
// int64 slot table (-1 = empty sentinel) cannot represent.
void lantern_sched_enqueue(void* h, uint64_t uid, int32_t prompt_len,
                           int32_t max_new, uint64_t now_ns) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  if (uid > static_cast<uint64_t>(INT64_MAX)) return;
  if (s->reqs.count(uid)) return;
  Request r;
  r.uid = uid;
  r.prompt_len = prompt_len;
  r.max_new = max_new;
  r.enqueue_ns = now_ns;
  s->reqs[uid] = r;
  s->queue.push_back(uid);
  s->total_enqueued++;
}

// Assign queued requests to free slots.  Writes up to num_slots
// (slot, uid) pairs into out_slots/out_uids; returns the count.  The caller
// prefills those requests and inserts them into the device batch.
int32_t lantern_sched_fill_slots(void* h, int32_t* out_slots,
                                 uint64_t* out_uids) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (int32_t i = 0; i < s->num_slots && !s->queue.empty(); ++i) {
    if (s->slots[i] >= 0) continue;
    uint64_t uid = s->queue.front();
    s->queue.pop_front();
    s->slots[i] = static_cast<int64_t>(uid);
    out_slots[n] = i;
    out_uids[n] = uid;
    ++n;
  }
  return n;
}

// Report per-slot progress after one device step.  Arrays are indexed by
// slot (length num_slots): committed-token counts, verify steps, acceptance
// sums.  Slots whose request reached max_new move to the finished queue and
// free up.  Returns the number of newly finished requests.
int32_t lantern_sched_report_step(void* h, const int32_t* n_new,
                                  const int32_t* steps,
                                  const int32_t* accept_sum) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t newly = 0;
  s->total_steps++;
  for (int32_t i = 0; i < s->num_slots; ++i) {
    if (s->slots[i] < 0) continue;
    uint64_t uid = static_cast<uint64_t>(s->slots[i]);
    auto it = s->reqs.find(uid);
    if (it == s->reqs.end()) continue;
    Request& r = it->second;
    int32_t prev = r.n_new;
    r.n_new = n_new[i];
    r.steps = steps[i];
    r.accept_sum = accept_sum[i];
    if (r.n_new > prev) s->total_tokens += static_cast<uint64_t>(r.n_new - prev);
    if (!r.done && r.n_new >= r.max_new) {
      r.done = true;
      s->finished.push_back(uid);
      s->slots[i] = -1;
      s->total_completed++;
      ++newly;
    }
  }
  return newly;
}

// Pop up to cap finished request uids (with their stats) for draining.
int32_t lantern_sched_drain(void* h, int32_t cap, uint64_t* out_uids,
                            int32_t* out_steps, int32_t* out_accept) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  while (n < cap && !s->finished.empty()) {
    uint64_t uid = s->finished.front();
    s->finished.pop_front();
    const Request& r = s->reqs.at(uid);
    out_uids[n] = uid;
    out_steps[n] = r.steps;
    out_accept[n] = r.accept_sum;
    ++n;
    s->reqs.erase(uid);
  }
  return n;
}

// Mark a request failed (e.g. its prefill raised): free its slot (or drop
// it from the waiting queue), erase it, and count it.  The batch keeps
// serving — failure capture lives here so a bad request can never wedge a
// slot.  Returns 1 if the uid was live, 0 otherwise.
int32_t lantern_sched_fail(void* h, uint64_t uid) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  auto it = s->reqs.find(uid);
  if (it == s->reqs.end()) return 0;
  for (auto& v : s->slots)
    if (v == static_cast<int64_t>(uid)) v = -1;
  for (auto q = s->queue.begin(); q != s->queue.end(); ++q)
    if (*q == uid) { s->queue.erase(q); break; }
  // a finished-but-undrained uid must leave the deque too, or a later
  // drain would .at() an erased request across the extern "C" boundary
  for (auto f = s->finished.begin(); f != s->finished.end();)
    f = (*f == uid) ? s->finished.erase(f) : f + 1;
  s->reqs.erase(it);
  s->total_failed++;
  return 1;
}

int32_t lantern_sched_num_failed(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->total_failed);
}

int32_t lantern_sched_num_waiting(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  return static_cast<int32_t>(s->queue.size());
}

int32_t lantern_sched_num_active(void* h) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  int32_t n = 0;
  for (auto v : s->slots) n += (v >= 0);
  return n;
}

// totals: [enqueued, completed, tokens, device_steps]
void lantern_sched_totals(void* h, uint64_t* out4) {
  auto* s = static_cast<Scheduler*>(h);
  std::lock_guard<std::mutex> lock(s->mu);
  out4[0] = s->total_enqueued;
  out4[1] = s->total_completed;
  out4[2] = s->total_tokens;
  out4[3] = s->total_steps;
}

}  // extern "C"
