// Native scenario loader: Waymo-Nocturne JSON -> flat arrays.
//
// The reference's scenario ingestion is C++ (nlohmann::json parsed into the
// Scenario object graph, nocturne/cpp/src/scenario.cc:207-1056). Here the
// native layer does the host-side heavy lifting for the TPU pipeline:
// parse the JSON and emit flat float arrays that Python wraps as numpy and
// feeds straight into the array pipeline — no per-object Python loops.
//
// Self-contained: a compact recursive-descent JSON parser (no third-party
// deps), C ABI for ctypes binding. Build: make -C native.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------------------
// Minimal JSON DOM
// ----------------------------------------------------------------------
struct JValue;
using JObject = std::map<std::string, JValue>;
using JArray = std::vector<JValue>;

struct JValue {
  enum Kind { kNull, kBool, kNumber, kString, kArray, kObject } kind = kNull;
  bool b = false;
  double num = 0.0;
  std::string str;
  std::shared_ptr<JArray> arr;
  std::shared_ptr<JObject> obj;

  const JValue* find(const char* key) const {
    if (kind != kObject || !obj) return nullptr;
    auto it = obj->find(key);
    return it == obj->end() ? nullptr : &it->second;
  }
  double number() const { return kind == kBool ? (b ? 1.0 : 0.0) : num; }
  size_t size() const { return arr ? arr->size() : 0; }
  const JValue& operator[](size_t i) const { return (*arr)[i]; }
};

class Parser {
 public:
  explicit Parser(const char* data, size_t n) : p_(data), end_(data + n) {}

  bool parse(JValue* out) { skip(); return value(out) && (skip(), true); }

  const char* error() const { return err_; }

 private:
  const char* p_;
  const char* end_;
  const char* err_ = nullptr;

  void skip() {
    while (p_ < end_ && (*p_ == ' ' || *p_ == '\t' || *p_ == '\n' || *p_ == '\r'))
      ++p_;
  }
  bool fail(const char* msg) { err_ = msg; return false; }

  bool value(JValue* out) {
    skip();
    if (p_ >= end_) return fail("eof");
    switch (*p_) {
      case '{': return object(out);
      case '[': return array(out);
      case '"': out->kind = JValue::kString; return string(&out->str);
      case 't':
        if (end_ - p_ >= 4 && !memcmp(p_, "true", 4)) {
          out->kind = JValue::kBool; out->b = true; p_ += 4; return true;
        }
        return fail("bad literal");
      case 'f':
        if (end_ - p_ >= 5 && !memcmp(p_, "false", 5)) {
          out->kind = JValue::kBool; out->b = false; p_ += 5; return true;
        }
        return fail("bad literal");
      case 'n':
        if (end_ - p_ >= 4 && !memcmp(p_, "null", 4)) {
          out->kind = JValue::kNull; p_ += 4; return true;
        }
        return fail("bad literal");
      default: return number(out);
    }
  }

  bool number(JValue* out) {
    char* endp = nullptr;
    out->num = strtod(p_, &endp);
    if (endp == p_) return fail("bad number");
    out->kind = JValue::kNumber;
    p_ = endp;
    return true;
  }

  bool string(std::string* out) {
    if (*p_ != '"') return fail("expected string");
    ++p_;
    out->clear();
    while (p_ < end_ && *p_ != '"') {
      if (*p_ == '\\') {
        ++p_;
        if (p_ >= end_) return fail("bad escape");
        switch (*p_) {
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          case 'r': out->push_back('\r'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'u': {
            // skip 4 hex digits; emit '?' (scenario files are ASCII)
            if (end_ - p_ < 5) return fail("bad \\u");
            p_ += 4;
            out->push_back('?');
            break;
          }
          default: out->push_back(*p_);
        }
        ++p_;
      } else {
        out->push_back(*p_++);
      }
    }
    if (p_ >= end_) return fail("unterminated string");
    ++p_;  // closing quote
    return true;
  }

  bool array(JValue* out) {
    ++p_;  // '['
    out->kind = JValue::kArray;
    out->arr = std::make_shared<JArray>();
    skip();
    if (p_ < end_ && *p_ == ']') { ++p_; return true; }
    while (true) {
      JValue v;
      if (!value(&v)) return false;
      out->arr->push_back(std::move(v));
      skip();
      if (p_ >= end_) return fail("unterminated array");
      if (*p_ == ',') { ++p_; continue; }
      if (*p_ == ']') { ++p_; return true; }
      return fail("expected , or ]");
    }
  }

  bool object(JValue* out) {
    ++p_;  // '{'
    out->kind = JValue::kObject;
    out->obj = std::make_shared<JObject>();
    skip();
    if (p_ < end_ && *p_ == '}') { ++p_; return true; }
    while (true) {
      skip();
      std::string key;
      if (!string(&key)) return false;
      skip();
      if (p_ >= end_ || *p_ != ':') return fail("expected :");
      ++p_;
      JValue v;
      if (!value(&v)) return false;
      out->obj->emplace(std::move(key), std::move(v));
      skip();
      if (p_ >= end_) return fail("unterminated object");
      if (*p_ == ',') { ++p_; continue; }
      if (*p_ == '}') { ++p_; return true; }
      return fail("expected , or }");
    }
  }
};

int object_type_id(const std::string& t) {
  std::string s;
  s.reserve(t.size());
  for (char c : t) s.push_back(std::tolower(c));
  if (s == "unset") return 0;
  if (s == "vehicle") return 1;
  if (s == "pedestrian") return 2;
  if (s == "cyclist") return 3;
  return 4;
}

int road_type_id(const std::string& t) {
  if (t == "none") return 0;
  if (t == "lane") return 1;
  if (t == "road_line") return 2;
  if (t == "road_edge") return 3;
  if (t == "stop_sign") return 4;
  if (t == "crosswalk") return 5;
  if (t == "speed_bump") return 6;
  return 7;
}

// TrafficLightState enum mapping (traffic_light.h:75-95 ParseTrafficLightState)
int tl_state_id(const std::string& t) {
  if (t == "stop") return 1;
  if (t == "caution") return 2;
  if (t == "go") return 3;
  if (t == "arrow_stop") return 4;
  if (t == "arrow_caution") return 5;
  if (t == "arrow_go") return 6;
  if (t == "flashing_stop") return 7;
  if (t == "flashing_caution") return 8;
  return 0;  // unknown
}

}  // namespace

// ----------------------------------------------------------------------
// C ABI
// ----------------------------------------------------------------------
extern "C" {

// All pointers owned by the handle; freed by scenario_free.
struct ScenarioRaw {
  int32_t num_agents;
  int32_t num_steps;  // T (91 raw; physics json: 90)
  int32_t is_physics;  // 1 if *_physics.json dialect
  // agents
  float* positions;   // [A, T, 2]
  float* headings;    // [A, T] radians, normalized
  float* velocities;  // [A, T, 2]
  uint8_t* valid;     // [A, T]
  float* length;      // [A]
  float* width;       // [A]
  int32_t* type;      // [A]
  float* goal_position;  // [A, 2]
  float* goal_heading;   // [A]
  float* goal_speed;     // [A]
  // physics-json extras (null otherwise)
  float* rewards;  // [A, T, 8]
  float* actions;  // [A, T, 2]
  // roads: concatenated points with per-road (offset, count, type)
  int32_t num_roads;
  int32_t total_road_points;
  float* road_points;     // [total, 2]
  int32_t* road_offsets;  // [num_roads]
  int32_t* road_counts;   // [num_roads]
  int32_t* road_types;    // [num_roads]
  // traffic lights (scenario.cc:222-241): dense per-step state streams,
  // 0 = unknown where no (state, time_index) entry exists
  int32_t num_lights;
  float* tl_positions;  // [num_lights, 2]
  int8_t* tl_state;     // [num_lights, T]
  char error[256];
};

static void set_error(ScenarioRaw* out, const char* msg) {
  snprintf(out->error, sizeof(out->error), "%s", msg);
}

ScenarioRaw* scenario_load(const char* path) {
  auto* out = new ScenarioRaw();
  memset(out, 0, sizeof(ScenarioRaw));

  FILE* f = fopen(path, "rb");
  if (!f) { set_error(out, "cannot open file"); return out; }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string data(n, '\0');
  if (fread(data.data(), 1, n, f) != (size_t)n) {
    fclose(f);
    set_error(out, "short read");
    return out;
  }
  fclose(f);

  JValue root;
  Parser parser(data.data(), data.size());
  if (!parser.parse(&root)) { set_error(out, parser.error()); return out; }

  const JValue* objects = root.find("objects");
  const JValue* roads = root.find("roads");
  if (!objects || objects->kind != JValue::kArray) {
    set_error(out, "missing objects");
    return out;
  }

  const size_t A = objects->size();
  if (A == 0) { set_error(out, "no objects"); return out; }
  const JValue& first = (*objects)[0];
  const bool physics = first.find("existence") != nullptr;
  const JValue* pos0 = first.find("position");
  if (!pos0 || pos0->kind != JValue::kArray) {
    set_error(out, "missing position stream");
    return out;
  }
  const size_t T = pos0->size();

  out->num_agents = (int32_t)A;
  out->num_steps = (int32_t)T;
  out->is_physics = physics ? 1 : 0;
  out->positions = (float*)calloc(A * T * 2, sizeof(float));
  out->headings = (float*)calloc(A * T, sizeof(float));
  out->velocities = (float*)calloc(A * T * 2, sizeof(float));
  out->valid = (uint8_t*)calloc(A * T, 1);
  out->length = (float*)calloc(A, sizeof(float));
  out->width = (float*)calloc(A, sizeof(float));
  out->type = (int32_t*)calloc(A, sizeof(int32_t));
  out->goal_position = (float*)calloc(A * 2, sizeof(float));
  out->goal_heading = (float*)calloc(A, sizeof(float));
  out->goal_speed = (float*)calloc(A, sizeof(float));
  if (physics) {
    out->rewards = (float*)calloc(A * T * 8, sizeof(float));
    out->actions = (float*)calloc(A * T * 2, sizeof(float));
  }

  const double kPi = 3.14159265358979323846;
  for (size_t a = 0; a < A; ++a) {
    const JValue& o = (*objects)[a];
    const JValue* pos = o.find("position");
    const JValue* heading = o.find("heading");
    const JValue* vel = o.find("velocity");
    const JValue* valid = physics ? o.find("existence") : o.find("valid");
    if (!pos || !heading || !vel || !valid) { set_error(out, "missing agent stream"); return out; }
    const size_t Ta = pos->size() < T ? pos->size() : T;
    for (size_t t = 0; t < Ta; ++t) {
      const JValue& pt = (*pos)[t];
      out->positions[(a * T + t) * 2 + 0] = (float)(pt.find("x") ? pt.find("x")->number() : 0);
      out->positions[(a * T + t) * 2 + 1] = (float)(pt.find("y") ? pt.find("y")->number() : 0);
      double h = (*heading)[t].number();
      if (!physics) {
        // raw dialect stores degrees (scenario.cc:930-931); wrap to (-pi, pi]
        h = h * kPi / 180.0;
      }
      h = fmod(h, 2.0 * kPi);
      if (h > kPi) h -= 2.0 * kPi;
      if (h <= -kPi) h += 2.0 * kPi;
      out->headings[a * T + t] = (float)h;
      const JValue& vt = (*vel)[t];
      out->velocities[(a * T + t) * 2 + 0] = (float)(vt.find("x") ? vt.find("x")->number() : 0);
      out->velocities[(a * T + t) * 2 + 1] = (float)(vt.find("y") ? vt.find("y")->number() : 0);
      out->valid[a * T + t] = (*valid)[t].number() != 0.0 ? 1 : 0;
    }
    const JValue* L = o.find("length");
    const JValue* W = o.find("width");
    out->length[a] = L ? (float)L->number() : 1.0f;
    out->width[a] = W ? (float)W->number() : 1.0f;
    const JValue* ty = o.find("type");
    out->type[a] = ty ? object_type_id(ty->str) : 1;

    if (physics) {
      const JValue* gp = o.find("goal_position");
      if (gp) {
        out->goal_position[a * 2 + 0] = (float)(gp->find("x") ? gp->find("x")->number() : 0);
        out->goal_position[a * 2 + 1] = (float)(gp->find("y") ? gp->find("y")->number() : 0);
      }
      const JValue* gh = o.find("goal_heading");
      const JValue* gs = o.find("goal_speed");
      out->goal_heading[a] = gh ? (float)gh->number() : 0.0f;
      out->goal_speed[a] = gs ? (float)gs->number() : 0.0f;
      const JValue* rew = o.find("reward");
      const JValue* acc = o.find("acceleration");
      const JValue* st = o.find("steering");
      if (rew)
        for (size_t t = 0; t < rew->size() && t < T; ++t)
          for (size_t k = 0; k < 8 && k < (*rew)[t].size(); ++k)
            out->rewards[(a * T + t) * 8 + k] = (float)(*rew)[t][k].number();
      if (acc && st)
        for (size_t t = 0; t < acc->size() && t < T; ++t) {
          out->actions[(a * T + t) * 2 + 0] = (float)(*acc)[t].number();
          out->actions[(a * T + t) * 2 + 1] = (float)(*st)[t].number();
        }
    } else {
      const JValue* gp = o.find("goalPosition");
      if (gp) {
        out->goal_position[a * 2 + 0] = (float)(gp->find("x") ? gp->find("x")->number() : 0);
        out->goal_position[a * 2 + 1] = (float)(gp->find("y") ? gp->find("y")->number() : 0);
      }
      // target heading/speed = last valid (scenario.cc:942-945)
      for (size_t t = 0; t < T; ++t) {
        if (out->valid[a * T + t]) {
          out->goal_heading[a] = out->headings[a * T + t];
          float vx = out->velocities[(a * T + t) * 2];
          float vy = out->velocities[(a * T + t) * 2 + 1];
          out->goal_speed[a] = std::sqrt(vx * vx + vy * vy);
        }
      }
    }
  }

  // roads
  if (roads && roads->kind == JValue::kArray) {
    const size_t R = roads->size();
    out->num_roads = (int32_t)R;
    out->road_offsets = (int32_t*)calloc(R, sizeof(int32_t));
    out->road_counts = (int32_t*)calloc(R, sizeof(int32_t));
    out->road_types = (int32_t*)calloc(R, sizeof(int32_t));
    std::vector<float> pts;
    pts.reserve(4096);
    for (size_t r = 0; r < R; ++r) {
      const JValue& road = (*roads)[r];
      const JValue* ty = road.find("type");
      out->road_types[r] = ty ? road_type_id(ty->str) : 7;
      out->road_offsets[r] = (int32_t)(pts.size() / 2);
      const JValue* geom = road.find("geometry");
      if (!geom) { out->road_counts[r] = 0; continue; }
      if (geom->kind == JValue::kObject) {  // stop sign: single point
        pts.push_back((float)(geom->find("x") ? geom->find("x")->number() : 0));
        pts.push_back((float)(geom->find("y") ? geom->find("y")->number() : 0));
        out->road_counts[r] = 1;
      } else if (geom->kind == JValue::kArray) {
        for (size_t p = 0; p < geom->size(); ++p) {
          const JValue& pt = (*geom)[p];
          pts.push_back((float)(pt.find("x") ? pt.find("x")->number() : 0));
          pts.push_back((float)(pt.find("y") ? pt.find("y")->number() : 0));
        }
        out->road_counts[r] = (int32_t)geom->size();
      }
    }
    out->total_road_points = (int32_t)(pts.size() / 2);
    out->road_points = (float*)malloc(pts.size() * sizeof(float));
    memcpy(out->road_points, pts.data(), pts.size() * sizeof(float));
  }

  // traffic lights (scenario.cc:222-241): lane positions are static (first
  // element); states are (state, time_index) pairs expanded to dense [L, T]
  const JValue* tls = root.find("tl_states");
  if (tls && tls->kind == JValue::kArray && tls->size() > 0) {
    const size_t L = tls->size();
    out->num_lights = (int32_t)L;
    out->tl_positions = (float*)calloc(L * 2, sizeof(float));
    out->tl_state = (int8_t*)calloc(L * T, sizeof(int8_t));
    for (size_t i = 0; i < L; ++i) {
      const JValue& tl = (*tls)[i];
      const JValue* xs = tl.find("x");
      const JValue* ys = tl.find("y");
      if (xs && xs->kind == JValue::kArray && xs->size() > 0)
        out->tl_positions[i * 2 + 0] = (float)(*xs)[0].number();
      if (ys && ys->kind == JValue::kArray && ys->size() > 0)
        out->tl_positions[i * 2 + 1] = (float)(*ys)[0].number();
      const JValue* st = tl.find("state");
      const JValue* ti = tl.find("time_index");
      if (!st || !ti || st->kind != JValue::kArray || ti->kind != JValue::kArray)
        continue;
      const size_t n = st->size() < ti->size() ? st->size() : ti->size();
      for (size_t k = 0; k < n; ++k) {
        const long tt = (long)(*ti)[k].number();
        if (tt < 0 || (size_t)tt >= T) continue;
        const JValue& sv = (*st)[k];
        const int sid = sv.kind == JValue::kString ? tl_state_id(sv.str)
                                                   : (int)sv.number();
        out->tl_state[i * T + tt] = (int8_t)sid;
      }
    }
  }

  return out;
}

void scenario_free(ScenarioRaw* s) {
  if (!s) return;
  free(s->positions);
  free(s->headings);
  free(s->velocities);
  free(s->valid);
  free(s->length);
  free(s->width);
  free(s->type);
  free(s->goal_position);
  free(s->goal_heading);
  free(s->goal_speed);
  free(s->rewards);
  free(s->actions);
  free(s->road_points);
  free(s->road_offsets);
  free(s->road_counts);
  free(s->road_types);
  free(s->tl_positions);
  free(s->tl_state);
  delete s;
}

}  // extern "C"
