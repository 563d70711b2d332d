// wide_deep_tpu native serving client.
//
// The reference's single native component was a gRPC PredictionService client
// (/root/reference/python/tensorflow_serving/client.cc:22-130).  Our scoring
// server (wide_deep_tpu/serving/server.py) exposes, alongside gRPC, a framed
// TCP endpoint designed for native clients: 'WDTS' <u32 LE len> <JSON>
// (serving/protocol.py).  This client reads TSV rows from a file, sends them
// for scoring, and prints per-row class + probability — the same CLI surface
// as the reference client.
//
// Build: make -C cpp serving_client
// Usage: ./serving_client --server_host=localhost --server_port=8501 \
//        --data_file=../data/pred/pred1 [--num_rows=N] [--model_name=wide_deep]

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

namespace {

bool send_all(int fd, const char* buf, size_t n) {
  while (n > 0) {
    ssize_t w = ::send(fd, buf, n, 0);
    if (w <= 0) return false;
    buf += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

bool recv_all(int fd, char* buf, size_t n) {
  while (n > 0) {
    ssize_t r = ::recv(fd, buf, n, 0);
    if (r <= 0) return false;
    buf += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

// minimal JSON string escaping for TSV row content
std::string json_escape(const std::string& s) {
  std::string out;
  out.reserve(s.size() + 8);
  for (unsigned char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\t': out += "\\t"; break;
      case '\n': out += "\\n"; break;
      case '\r': out += "\\r"; break;
      default:
        if (c < 0x20) {
          char buf[8];
          std::snprintf(buf, sizeof buf, "\\u%04x", c);
          out += buf;
        } else {
          out += static_cast<char>(c);
        }
    }
  }
  return out;
}

// extract "scores": [[...],...] and "class_ids": [...] from the response
// JSON (flat, trusted server) without a JSON library.
bool parse_scores(const std::string& body,
                  std::vector<std::vector<double>>* scores,
                  std::vector<int>* class_ids, std::string* error) {
  size_t epos = body.find("\"error\"");
  if (epos != std::string::npos) {
    size_t q1 = body.find('"', epos + 7 + 1);
    size_t q2 = body.find('"', q1 + 1);
    *error = body.substr(q1 + 1, q2 - q1 - 1);
    return false;
  }
  size_t pos = body.find("\"scores\"");
  if (pos == std::string::npos) { *error = "no scores field"; return false; }
  pos = body.find('[', pos);
  size_t depth = 0;
  std::vector<double> row;
  std::string num;
  auto flush_num = [&]() {
    if (!num.empty()) { row.push_back(std::strtod(num.c_str(), nullptr)); num.clear(); }
  };
  for (size_t i = pos; i < body.size(); ++i) {
    char c = body[i];
    if (c == '[') { ++depth; if (depth == 2) row.clear(); }
    else if (c == ']') {
      flush_num();
      if (depth == 2) scores->push_back(row);
      if (--depth == 0) { pos = i + 1; break; }
    } else if (c == ',') { flush_num(); }
    else if ((c >= '0' && c <= '9') || c == '.' || c == '-' || c == 'e' ||
             c == 'E' || c == '+') { num += c; }
  }
  size_t cpos = body.find("\"class_ids\"", pos);
  if (cpos != std::string::npos) {
    size_t a = body.find('[', cpos);
    size_t b = body.find(']', a);
    std::stringstream ss(body.substr(a + 1, b - a - 1));
    std::string tok;
    while (std::getline(ss, tok, ','))
      if (!tok.empty()) class_ids->push_back(std::atoi(tok.c_str()));
  }
  return true;
}

struct Flags {
  std::string host = "localhost";
  int port = 8501;
  std::string data_file;
  std::string model_name = "wide_deep";
  std::string auth_token;  // shared-secret request auth (empty = none)
  int num_rows = 10;
};

bool parse_flags(int argc, char** argv, Flags* f) {
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto val = [&](const char* name) -> const char* {
      size_t n = std::strlen(name);
      if (a.compare(0, n, name) == 0 && a[n] == '=') return a.c_str() + n + 1;
      return nullptr;
    };
    if (const char* v = val("--server_host")) f->host = v;
    else if (const char* v = val("--server_port")) f->port = std::atoi(v);
    else if (const char* v = val("--data_file")) f->data_file = v;
    else if (const char* v = val("--model_name")) f->model_name = v;
    else if (const char* v = val("--auth_token")) f->auth_token = v;
    else if (const char* v = val("--num_rows")) f->num_rows = std::atoi(v);
    else {
      std::cerr << "unknown flag: " << a << "\n";
      return false;
    }
  }
  return !f->data_file.empty();
}

}  // namespace

int main(int argc, char** argv) {
  Flags flags;
  if (!parse_flags(argc, argv, &flags)) {
    std::cerr << "usage: serving_client --data_file=FILE "
                 "[--server_host=H] [--server_port=P] [--model_name=N] "
                 "[--num_rows=K]\n";
    return 2;
  }

  std::ifstream in(flags.data_file);
  if (!in) {
    std::cerr << "cannot open " << flags.data_file << "\n";
    return 1;
  }
  std::vector<std::string> rows;
  std::string line;
  while (static_cast<int>(rows.size()) < flags.num_rows &&
         std::getline(in, line)) {
    if (!line.empty()) rows.push_back(line);
  }

  // request JSON
  std::string body = "{\"model_name\":\"" + flags.model_name + "\"";
  if (!flags.auth_token.empty())
    body += ",\"auth_token\":\"" + json_escape(flags.auth_token) + "\"";
  body += ",\"signature\":\"serving_default\",\"rows\":[";
  for (size_t i = 0; i < rows.size(); ++i) {
    if (i) body += ',';
    body += '"' + json_escape(rows[i]) + '"';
  }
  body += "]}";

  // connect
  struct addrinfo hints {}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  std::string port_s = std::to_string(flags.port);
  if (getaddrinfo(flags.host.c_str(), port_s.c_str(), &hints, &res) != 0) {
    std::cerr << "cannot resolve " << flags.host << "\n";
    return 1;
  }
  int fd = ::socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || ::connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    std::cerr << "cannot connect to " << flags.host << ":" << flags.port
              << "\n";
    return 1;
  }
  freeaddrinfo(res);

  // frame: 'WDTS' + u32 LE length + payload
  uint32_t len = static_cast<uint32_t>(body.size());
  char header[8] = {'W', 'D', 'T', 'S'};
  std::memcpy(header + 4, &len, 4);
  if (!send_all(fd, header, 8) || !send_all(fd, body.data(), body.size())) {
    std::cerr << "send failed\n";
    return 1;
  }
  char rheader[8];
  if (!recv_all(fd, rheader, 8) || std::memcmp(rheader, "WDTS", 4) != 0) {
    std::cerr << "bad response frame\n";
    return 1;
  }
  uint32_t rlen;
  std::memcpy(&rlen, rheader + 4, 4);
  // MAX_FRAME parity with serving/protocol.py: a bogus/desynced length
  // would otherwise attempt a ~4 GiB allocation and hang in recv_all
  if (rlen > (64u << 20)) {
    std::cerr << "response frame too large (" << rlen << " bytes)\n";
    return 1;
  }
  std::string resp(rlen, '\0');
  if (!recv_all(fd, resp.data(), rlen)) {
    std::cerr << "recv failed\n";
    return 1;
  }
  ::close(fd);

  std::vector<std::vector<double>> scores;
  std::vector<int> class_ids;
  std::string error;
  if (!parse_scores(resp, &scores, &class_ids, &error)) {
    std::cerr << "server error: " << error << "\n";
    return 1;
  }
  for (size_t i = 0; i < scores.size(); ++i) {
    int cid = i < class_ids.size() ? class_ids[i] : 0;
    // both bounds: a negative class id from a misbehaving peer would be
    // a negative vector index (UB), not a fallback
    double p = (cid >= 0 && cid < static_cast<int>(scores[i].size()))
                   ? scores[i][cid] : 0.0;
    std::printf("%zu\tclass: %d\tprobability: %.6f\n", i, cid, p);
  }
  return 0;
}
